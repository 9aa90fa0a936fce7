package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

import graft.operators.{BigramLm, Components, MinHash, PairVerify, TextOps}

/** The streaming curation gate — q162's batch waterfall as a production
  * INGEST pipeline: every micro-batch of raw documents flows through
  *
  *   1. Gopher repetition rules (Rae et al. 2021) — top-bigram position
  *      share + duplicated-trigram coverage, exact integer ppm;
  *   2. CCNet perplexity filter (Wenzek et al. 2020) — cross-entropy
  *      under a STATICALLY-trained reference bigram LM (CCNet's fixed
  *      reference-model shape: train once on a trusted slice, score
  *      forever; per-micro-batch scores are bit-identical to batch
  *      scores because the model never moves);
  *   3. near-dup dedup against the ACCEPTED-SURVIVOR index (the
  *      [[BatchIndex]] device shared with [[StreamingDedup]]) — banding
  *      against stored signatures (no re-shingling of history), exact
  *      Jaccard verify on candidates only;
  *
  * survivors are appended to the index and the q150-style dataset
  * manifest is maintained INCREMENTALLY — per-batch abelian partials
  * (count / char sum / fp sum mod p / fp xor) that merge to exactly the
  * batch manifest of the accepted corpus at any point in time.
  *
  * Reference semantics anchor: the dedup-then-join composition of
  * flink playground `WithDeduplicateJoinJob.java:88-104` under the
  * state-bounded continuous-ingest intent of `WithStateTtlJob.java:80-94`
  * — here the "state" is the survivor index laid out as idempotent
  * per-batch directories rather than operator state, so a retry rewrites
  * its own directory and a restart resumes with zero recovery logic.
  *
  * Survivorship policy (matches [[batchWaterfall]], the one-shot twin):
  *  - quality verdicts are PER-DOC map-side decisions against fixed
  *    thresholds and a fixed LM — batch boundaries cannot change them;
  *  - a batch doc near-dup of any ACCEPTED doc drops (accepted-first —
  *    the online ingest rule);
  *  - within a batch, verified near-dup pairs cluster (connected
  *    components) and the LONGEST text per cluster survives (ties →
  *    smallest id) — q162's keep-longest policy;
  *  - docs too short to shingle can never be near-dups: always accepted,
  *    never indexed.
  *
  * DOCUMENTED cross-batch ordering divergence vs [[batchWaterfall]]:
  * when a near-dup cluster spans batches, the stream keeps the FIRST
  * accepted member (even if a later arrival is longer), while the batch
  * twin sees the whole cluster at once and keeps the longest; and a
  * dropped doc's links don't chain (Jaccard is not transitive — see
  * [[StreamingDedup]]'s scaladoc for the keeps-strictly-more argument).
  * The two agree exactly when each cluster's longest member arrives
  * first (or clusters don't span batches) — StreamingSpec pins both the
  * equality and the divergence case.
  *
  * 100 TB shape: stages 1–2 are map-side projections + one batch-sized
  * gram agg per micro-batch. The LM scoring joins are AQE-decided by
  * default — [[staticLm]]'s default model is the EXACT unpruned one,
  * whose tables grow with the trusted slice and are not legally
  * broadcastable (see [[graft.operators.BigramLm.score]]'s contract);
  * the production CCNet shape (fixed-vocab pruned model, scoring as two
  * MAP-SIDE broadcast hash joins — the q163 plan) is one configuration
  * away: `staticLm(trusted, text, minPair = 2, minCtx = 2)` +
  * `Config(broadcastLm = true)`, with verdicts identical whenever the
  * thresholds classify the same docs (retained bits are exactly the
  * full model's; pruned entries fall back one smoothing level —
  * gate-conservative, the disclosed q163 estimator). Stage 3's
  * per-batch work is banding the batch
  * against stored signatures and exact-verifying candidates only; the
  * accepted corpus never re-scans its raw documents. The manifest
  * partials are |sources|-sized rows per batch.
  */
object CurationGate {

  /** Gate thresholds + dedup parameters. Defaults are q162's (corpus-
    * calibrated thresholds; exact-Jaccard 0.6 dedup).
    */
  final case class Config(
      top2PpmMax: Long = 80000L,
      dup3PpmMax: Long = 100000L,
      xentFpMax: Long = 322000L,
      ngram: Int = 3,
      k: Int = 128,
      b: Int = 32,
      r: Int = 4,
      seed: Long = 42L,
      num: Int = 6,
      den: Int = 10,
      broadcastLm: Boolean = false)

  /** Train the reference LM on a trusted static slice and MATERIALIZE
    * its frames (truncated lineage), so per-micro-batch scoring joins
    * against fixed tables instead of re-running the train DAG every
    * batch — the "train once, score forever" contract that makes
    * streamed scores bit-identical to batch scores.
    */
  def staticLm(trusted: DataFrame, textCol: String,
      minPair: Long = 1L, minCtx: Long = 1L): BigramLm.Lm = {
    val pairs = trusted
      .select(explode(BigramLm.bigramPairs(TextOps.tokens(col(textCol)))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val lm = BigramLm.train(pairs, minPair = minPair, minCtx = minCtx)
    BigramLm.Lm(
      graft.Engine.truncate(lm.pairBits),
      graft.Engine.truncate(lm.ctxBits),
      graft.Engine.truncate(lm.unk))
  }

  /** Per-doc gram counts, both sizes in ONE explosion (q162's shared
    * frame, via [[graft.operators.CorpusGrams]]): (__gid, k, g, c). The
    * k=2 grams double as the LM's bigrams.
    */
  private def gramCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.operators.CorpusGrams.counts(
      docs.select(col(idCol).as("__gid"), col(textCol)), Seq("__gid"), textCol)

  /** Ids FLAGGED by the quality stages (repetition OR perplexity) over a
    * pre-counted gram frame. Docs absent from the frame (or lacking a
    * gram size — e.g. 2 tokens ⇒ bigrams but no trigrams) cannot be
    * flagged by the missing rule: too short to repeat is too short to
    * flag, and a doc with no bigrams has no cross-entropy — both pass.
    */
  private def flaggedIds(grams: DataFrame, lm: BigramLm.Lm, cfg: Config): DataFrame = {
    val rep = grams
      .groupBy(col("__gid"))
      .agg(max(when(col("k") === 2, col("c"))).as("top2"),
        sum(when(col("k") === 2, col("c"))).as("n2"),
        sum(when(col("k") === 3 && col("c") >= 2, col("c")).otherwise(lit(0L))).as("dup3"),
        sum(when(col("k") === 3, col("c"))).as("n3"))
      .select(col("__gid"),
        when(col("n2") > 0, expr("(top2 * 1000000) div n2")).otherwise(lit(0L)).as("top2ppm"),
        when(col("n3") > 0, expr("(dup3 * 1000000) div n3")).otherwise(lit(0L)).as("dup3ppm"))
      .where(col("top2ppm") > cfg.top2PpmMax || col("dup3ppm") > cfg.dup3PpmMax)
      .select(col("__gid"))
    val bg2 = grams.where(col("k") === 2)
      .select(col("__gid"),
        split(col("g"), " ").getItem(0).as("w1"),
        split(col("g"), " ").getItem(1).as("w2"), col("c"))
    val ppl = BigramLm.score(bg2, Seq("__gid"), lm, Some("c"),
        broadcastLm = cfg.broadcastLm)
      .where(col("xent_fp") > cfg.xentFpMax)
      .select(col("__gid"))
    rep.unionByName(ppl).distinct()
  }

  /** Manifest partial of one accepted slice: q150's abelian reducers
    * (count, char sum, fingerprint sum mod p, fingerprint xor) per
    * `sourceCol` — order- and batch-independent, so per-batch partials
    * merge to exactly the one-shot manifest.
    */
  private def manifestPartial(survivors: DataFrame, sourceCol: String,
      textCol: String): DataFrame =
    survivors
      .select(col(sourceCol).as("source"),
        length(col(textCol)).cast("long").as("nc"),
        TextOps.docFingerprint(TextOps.tokens(col(textCol))).as("fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nc")).as("total_chars"),
        expr("CAST(sum(CAST(fp AS DECIMAL(38,0))) % 1000000007 AS BIGINT)").as("fp_sum"),
        expr("bit_xor(fp)").as("fp_xor"))

  private val ManifestSchema = StructType(Seq(
    StructField("source", StringType), StructField("n_docs", LongType),
    StructField("total_chars", LongType), StructField("fp_sum", LongType),
    StructField("fp_xor", LongType)))

  /** The accepted corpus's manifest: per-source rows + a TOTAL row,
    * merged from the per-batch partials. Both reducers are abelian, so
    * ((a mod p) + (b mod p)) mod p and xor-of-xors reproduce the
    * one-shot q150 manifest bit-for-bit.
    *
    * READ CONTRACT (review r13 pass 5): the manifest tree is a
    * marker-less single-writer layout, so this out-of-band read is
    * exact only while the stream is idle or between batches — called
    * DURING an in-flight batch-N retry it can see a partially rewritten
    * `batch=N` dir (an overwrite is not atomic) and return partial
    * rows for that one batch. Monitoring callers tolerate that
    * transiently; an exact read quiesces the stream first (every test
    * and query here reads after processAllAvailable). Dead-incarnation
    * dirs beyond the live batch id are purged by the next batch commit.
    */
  def currentManifest(spark: SparkSession, manifestPath: String): DataFrame = {
    val template = spark.createDataFrame(new java.util.ArrayList[Row](), ManifestSchema)
    BatchIndex.read(spark, manifestPath, template, beforeBatch = Long.MaxValue)
      .rollup(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("total_chars")).as("total_chars"),
        expr("CAST(sum(CAST(fp_sum AS DECIMAL(38,0))) % 1000000007 AS BIGINT)").as("fp_sum"),
        expr("bit_xor(fp_xor)").as("fp_xor"))
      .select(coalesce(col("source"), lit("TOTAL")).as("source"),
        col("n_docs"), col("total_chars"), col("fp_sum"), col("fp_xor"))
  }

  /** Run the gate. `onSurvivors` receives each batch's accepted ORIGINAL
    * rows (full input schema) plus the batchId. `docs` must carry
    * `idCol` (numeric, unique), `textCol`, and `sourceCol` (the manifest
    * key). The LM comes from [[staticLm]] (or any pre-materialized
    * [[BigramLm.Lm]]).
    */
  /** `compactEvery = Some(n)`: auto-compact both state trees after
    * every n-th committed batch (default fold bound — the just-
    * committed batch stays live), bounding the directory count a
    * long-running ingest accumulates; [[compact]] stays available for
    * operator-driven runs.
    */
  def run(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      lm: BigramLm.Lm,
      indexPath: String,
      manifestPath: String,
      cfg: Config = Config(),
      compactEvery: Option[Int] = None)(
      onSurvivors: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    require(cfg.b * cfg.r <= cfg.k, s"b*r must not exceed k: ${cfg.b}*${cfg.r} > ${cfg.k}")
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      // ---- stages 1+2: map-side quality verdicts off ONE gram frame
      val grams = gramCounts(batch, idCol, textCol).persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val qualityDrop = flaggedIds(grams, lm, cfg).select(col("__gid").as(idCol))
        // truncate before the pair stage: doc-sized frame, and the dedup
        // stage + survivor emit would each re-run the LM's 16-projection
        // scoring plan otherwise (the q162 measurement)
        val filtered = graft.Engine.truncate(
          batch.join(qualityDrop, Seq(idCol), "left_anti"))
        // ---- stage 3: dedup against the accepted-survivor index
        val batchIdx = MinHash.corpusIndex(filtered, idCol, textCol, cfg.ngram, cfg.k, cfg.seed)
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          // purge dead-incarnation state BEFORE reading accepted state
          // (review r13 pass 5): with a reused indexPath and a reset
          // checkpoint, batch dirs/runs BEYOND this batch id are a dead
          // stream's leftovers — read before purging, they would dedup
          // this batch against phantom accepted rows and commit the
          // wrong survivor set before the old post-write purge ever
          // ran. (Dead runs wholly at-or-below the current batch id are
          // indistinguishable from a legitimate restart-after-
          // compaction and are kept: reusing a non-empty tree with a
          // fresh checkpoint is supported only up to that ambiguity —
          // start fresh paths for fresh corpora.)
          BatchIndex.purgeBeyond(spark, indexPath, batchId)
          BatchIndex.purgeBeyond(spark, DedupStage.bandsPath(indexPath), batchId)
          // the stored signature tree is read only for its (__id, __sh)
          // columns (exact verify of banded candidates); the banding
          // probe runs against the PRECOMPUTED, bucket-partitioned band
          // tree — no re-banding of history, and the scan prunes to the
          // partitions this batch touches (DedupStage's scaladoc)
          val accepted = BatchIndex.read(spark, indexPath, batchIdx, beforeBatch = batchId)
          val acceptedBands = DedupStage.readBands(spark, indexPath,
            DedupStage.bandRows(batchIdx, cfg.b, cfg.r), beforeBatch = batchId)
          // accepted-first rule — the [[DedupStage]] protocol shared
          // with StreamingDedup (drop set localCheckpointed inside)
          val dupOfAccepted = DedupStage.dupOfAccepted(
            batchIdx, acceptedBands, accepted, cfg.b, cfg.r, cfg.num, cfg.den)
          val fresh = batchIdx.join(dupOfAccepted, Seq("__id"), "left_anti")
          // within-batch: cluster verified pairs, keep the longest text
          // per cluster (ties -> smallest id) — q162's policy
          val innerCands = MinHash.candidatePairs(
            fresh.select(col("__id"), col("__sig")), "__id", "__sig", cfg.b, cfg.r)
          val innerPairs = PairVerify.exact(innerCands,
              fresh.select(col("__id"), col("__sh")), cfg.num, cfg.den)
            .select(col("id_a"), col("id_b"))
            .localCheckpoint(true)
          val innerDrop = keepLongestDrops(innerPairs, filtered, idCol, textCol, "__id")
            .localCheckpoint(true)
          // ---- commit: index rows (overwrite = retry-idempotent), purge
          // dead incarnations, manifest partial, then emit survivors
          fresh.join(innerDrop, Seq("__id"), "left_anti")
            .select(col("__id"), col("__sh"), col("__sig"))
            .write.mode("overwrite").parquet(s"$indexPath/batch=$batchId")
          // band the just-written batch into the band tree (batch-sized,
          // retry-idempotent like the signature write it mirrors)
          DedupStage.commitBands(spark, indexPath, batchId, cfg.b, cfg.r, batchIdx)
          val dropIds = dupOfAccepted.unionByName(innerDrop).select(col("__id").as(idCol))
          val survivors = graft.Engine.truncate(
            filtered.join(dropIds, Seq(idCol), "left_anti"))
          manifestPartial(survivors, sourceCol, textCol)
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$manifestPath/batch=$batchId")
          BatchIndex.purgeBeyond(spark, manifestPath, batchId)
          compactEvery.filter(_ > 0).foreach { every =>
            // tiered: bounded write amplification over a long ingest
            // (a full fold would rewrite the whole accepted corpus
            // every `every` batches — O(N²) total bytes written)
            if ((batchId + 1) % every == 0)
              compact(spark, indexPath, manifestPath, tiered = true)
          }
          onSurvivors(survivors, batchId)
        } finally { batchIdx.unpersist(); () }
      } finally { grams.unpersist(); () }
    }
  }

  /** Compact both state trees — the survivor index and the manifest
    * partials — into consolidated [[BatchIndex]] generations: results
    * ([[currentManifest]], the dedup verdicts of every later batch) are
    * bit-identical, but a reader opens ONE directory plus the batches
    * newer than it instead of one directory per micro-batch ever run
    * (the streaming small-files fix). Manifest partial ROWS are
    * relocated, not merged — [[currentManifest]]'s abelian rollup is
    * the merge, so relocation cannot change it. Safe beside live
    * ingest with the default `upTo` (the newest batch dir stays live —
    * see [[BatchIndex.compact]]'s retry guard).
    */
  def compact(spark: SparkSession, indexPath: String, manifestPath: String,
      upTo: Option[Long] = None, tiered: Boolean = false): Unit = {
    BatchIndex.compact(spark, indexPath, upTo = upTo, tiered = tiered)
    BatchIndex.compact(spark, DedupStage.bandsPath(indexPath),
      partitionCols = Seq("__bp"), upTo = upTo, tiered = tiered)
    BatchIndex.compact(spark, manifestPath, schema = Some(ManifestSchema),
      upTo = upTo, tiered = tiered)
    ()
  }

  /** The ONE-SHOT twin: identical verdicts and survivorship policy over
    * a static corpus — the equality target for the stream (exact when no
    * near-dup cluster spans batches with a non-first longest member; see
    * the class doc for the documented divergence). Returns the surviving
    * input rows.
    */
  /** q162's within-batch survivorship policy, shared VERBATIM by
    * [[run]] and [[batchWaterfall]] (review r13 pass 5 — the gates'
    * pinned stream/batch equality must not be maintainable as two
    * hand-kept copies): cluster the verified pairs, keep the longest
    * text per cluster (ties → smallest id). Returns the DROPPED ids as
    * a one-column frame named `outCol`.
    */
  private def keepLongestDrops(pairs: DataFrame, filtered: DataFrame,
      idCol: String, textCol: String, outCol: String): DataFrame = {
    val comp = Components.connectedComponents(pairs, "id_a", "id_b")
    val lens = filtered.select(col(idCol).cast("long").as("id"),
      length(col(textCol)).cast("long").as("__len"))
    comp.join(lens, Seq("id"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("comp")).orderBy(col("__len").desc, col("id").asc)))
      .where(col("__rk") =!= 1).select(col("id").as(outCol))
  }

  def batchWaterfall(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lm: BigramLm.Lm,
      cfg: Config = Config()): DataFrame = {
    // the same misconfiguration guard as [[run]] (review r13 pass 5):
    // b*r > k would slice past the signature and push every doc into
    // one shared bucket per overrun band — toward an all-pairs join —
    // instead of failing fast like the streaming twin
    require(cfg.b * cfg.r <= cfg.k, s"b*r must not exceed k: ${cfg.b}*${cfg.r} > ${cfg.k}")
    val grams = gramCounts(docs, idCol, textCol)
    val qualityDrop = flaggedIds(grams, lm, cfg).select(col("__gid").as(idCol))
    val filtered = graft.Engine.truncate(docs.join(qualityDrop, Seq(idCol), "left_anti"))
    val idx = MinHash.corpusIndex(filtered, idCol, textCol, cfg.ngram, cfg.k, cfg.seed)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val cands = MinHash.candidatePairs(
        idx.select(col("__id"), col("__sig")), "__id", "__sig", cfg.b, cfg.r)
      val pairs = PairVerify.exact(cands, idx.select(col("__id"), col("__sh")), cfg.num, cfg.den)
        .select(col("id_a"), col("id_b"))
        .localCheckpoint(true)
      val drops = keepLongestDrops(pairs, filtered, idCol, textCol, idCol)
      graft.Engine.truncate(filtered.join(drops, Seq(idCol), "left_anti"))
    } finally { idx.unpersist(); () }
  }
}
