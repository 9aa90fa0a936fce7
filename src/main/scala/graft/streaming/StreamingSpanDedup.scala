package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.SpanDedup

/** Incremental SPAN-LEVEL dedup of a document stream — the
  * [[graft.operators.SpanDedup]] modality as an ingest gate, completing
  * the span row of the streaming-gate matrix (doc-level near-dup:
  * [[StreamingDedup]]/[[CurationGate]]; media: [[StreamingPhashDedup]];
  * embeddings: [[StreamingSemDedup]]; exact substring spans: this).
  * MinHash asks "is this doc mostly the same SET of shingles as an
  * accepted doc?"; the span gate asks the stricter ordered question
  * "what fraction of this doc's words sit inside contiguous runs of
  * ≥ l words copied verbatim from an accepted doc?" — the Lee et al.
  * duplicated-span criterion applied at ingest time.
  *
  * Policy — greedy ONLINE span dedup, mirroring [[StreamingDedup]]
  * clause for clause:
  *  1. accepted-first — a batch doc whose COVERAGE (distinct word
  *     positions inside ≥ l-word spans shared with ANY accepted doc,
  *     over its word count) reaches `maxCoveragePpm` drops;
  *  2. lowest-id-within-batch — coverage of a batch doc from
  *     LOWER-id batch docs (dropped or not — the same one-shot
  *     keep-lowest-id rule as [[StreamingSemDedup]]'s in-batch clause)
  *     is counted the same way; crossing the threshold drops it;
  *  3. docs shorter than l words produce no grams, can never be
  *     span-covered, and pass through accepted-but-not-indexed — the
  *     too-short-to-shingle rule.
  * The online-vs-one-shot divergence is the documented gate family
  * one: a dropped doc's grams never enter the index, so the online
  * gate keeps strictly more data than a one-shot pass over the union;
  * re-running the batch operator over the accepted corpus converges
  * the two.
  *
  * STATE is the accepted corpus's ANCHOR-GRAM index: rows
  * (__id, pos, __gh, __gp) — 8-byte xxhash64 gram fingerprints, NOT
  * gram strings (the [[SpanDedup]] scaladoc's corpus-scale swap: a
  * false anchor needs a 64-bit collision AND diagonal adjacency to
  * perturb coverage, ~2⁻⁶⁴ per candidate pair — disclosed, and the
  * whole verdict arithmetic is defined on the hashes so it stays
  * deterministic). Layout is the [[BatchIndex]] contract, partitioned
  * by `__gp = pmod(__gh, 64)` so the per-batch probe prunes the stored
  * scan to the ≤ 64 bucket partitions the batch touches (driver-side
  * collect bounded by 64 — the [[DedupStage]] device).
  *
  * STOP-GRAM rule online: a gram whose document frequency over the
  * VISIBLE universe (this batch ∪ the touched accepted partitions)
  * exceeds `dfCap` seeds no anchors this batch — the same
  * candidate-volume bound as the batch operator (Σ df² ≤ cap·grams),
  * evaluated against exactly the state the gate can see. As history
  * grows a gram can cross the cap and stop seeding LATER batches
  * (boilerplate discovered online) — deterministic given the state,
  * disclosed divergence from a global-df batch pass.
  *
  * 100 TB shape: per batch the work is gramming the batch (map-side),
  * ONE partition-pruned scan of the stored gram index restricted to
  * touched buckets, one hash equi-join for anchors (AQE splits residual
  * hot grams under the cap), match-bounded island windows, and a
  * batch-sized write. History is never re-grammed and never re-read
  * outside touched buckets.
  */
object StreamingSpanDedup {

  /** Bucket-partition count of the gram index — the prune granularity
    * (the [[DedupStage.BucketPartitions]] convention).
    */
  val BucketPartitions = 64

  /** One doc frame's hashed positional grams: (__id, pos, __gh, __gp).
    * Gram strings never leave the map side.
    */
  private[graft] def gramRows(
      docs: DataFrame, idCol: String, textCol: String, l: Int): DataFrame =
    SpanDedup.grams(docs, idCol, textCol, l)
      .select(col("id").as("__id"), col("pos"),
        xxhash64(col("gram")).as("__gh"))
      .withColumn("__gp", pmod(col("__gh"), lit(BucketPartitions.toLong)))

  /** Covered word positions per RIGHT doc: for every (left, right) doc
    * pair with left-grams `lg` (as __ida, pa, __gh) and right-grams
    * `rg` (as __idb, pb, __gh), diagonal islands of matching anchors →
    * spans → distinct covered positions — (__idb, pos). `pairPred`
    * restricts the pair universe (e.g. within-batch ordering).
    */
  private def coveredPositions(
      lg: DataFrame, rg: DataFrame, l: Int,
      pairPred: org.apache.spark.sql.Column): DataFrame = {
    val m = rg.join(lg, Seq("__gh")).where(pairPred)
      .select(col("__ida"), col("__idb"), col("__pa"), col("__pb"))
    val wD = Window.partitionBy(col("__ida"), col("__idb"), col("__diag"))
      .orderBy(col("__pb"))
    m.withColumn("__diag", col("__pa") - col("__pb"))
      .withColumn("__grp", col("__pb") - row_number().over(wD))
      .groupBy(col("__ida"), col("__idb"), col("__diag"), col("__grp"))
      .agg(min(col("__pb")).as("__start"),
        (count(lit(1)) + lit(l - 1)).as("__span"))
      .select(col("__idb"),
        explode(sequence(col("__start"), col("__start") + col("__span") - 1)).as("pos"))
      .distinct()
  }

  /** Run the incremental span gate; `onSurvivors` receives each batch's
    * ACCEPTED original rows (full input schema) plus the batchId.
    * `maxCoveragePpm`: drop threshold on covered-words/total-words in
    * ppm (500000 = half the doc copied verbatim from accepted docs).
    * `compactEvery` wires tiered [[compact]] in-band, as the other
    * gates do.
    */
  def run(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      l: Int = 8,
      dfCap: Int = 32,
      maxCoveragePpm: Long = 500000L,
      compactEvery: Option[Int] = None)(
      onSurvivors: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    require(maxCoveragePpm >= 1 && maxCoveragePpm <= 1000000L,
      s"maxCoveragePpm must be in [1, 1000000], got $maxCoveragePpm")
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val bg = gramRows(batch, idCol, textCol, l).localCheckpoint(true)
      // word counts for the coverage denominator (batch-sized)
      val nw = batch.select(col(idCol).as("__id"),
        size(split(lower(col(textCol)), " ")).cast("long").as("__nw"))
      // touched bucket partitions: ≤ 64 values via the driver — prunes
      // the stored gram scan at PartitionFilters level
      val touched = bg.select(col("__gp")).distinct()
        .collect().map(_.getLong(0)).toSeq
      // the stored scan is pruned TWICE before materialization: the
      // touched-bucket PartitionFilters prune, then a semi-join on the
      // batch's own gram set (ADVICE r12 — without it the checkpoint
      // copied every touched bucket's FULL history each batch, O(history)
      // write amplification; a typical batch touches all 64 buckets).
      // Dropping history grams absent from the batch changes nothing
      // downstream: the anchor join (covAcc) needs both sides to share a
      // __gh, and the stop-df of a gram is only ever consulted for grams
      // the batch carries — for those the df over (batch ∪ semi-joined
      // accepted) equals the df over (batch ∪ touched buckets) exactly.
      // purge dead-incarnation state BEFORE reading accepted state
      // (review r13 pass 5 — the CurationGate ordering): leftovers
      // beyond this batch id must not serve as phantom accepted grams
      BatchIndex.purgeBeyond(spark, indexPath, batchId)
      val accepted = BatchIndex.read(spark, indexPath, bg, beforeBatch = batchId)
        .where(col("__gp").isin(touched: _*))
        .join(bg.select(col("__gh")).distinct(), Seq("__gh"), "left_semi")
        .localCheckpoint(true)
      // online stop grams: df over the visible universe (batch ∪
      // touched accepted buckets) above the cap seeds no anchors
      val stop = bg.select(col("__gh"), col("__id"))
        .unionByName(accepted.select(col("__gh"), col("__id")))
        .groupBy(col("__gh")).agg(countDistinct(col("__id")).as("__df"))
        .where(col("__df") > dfCap).select(col("__gh"))
      val bgSeed = bg.join(stop, Seq("__gh"), "left_anti")
        .localCheckpoint(true)
      val accSeed = accepted.join(stop, Seq("__gh"), "left_anti")

      // 1. accepted-first: coverage of each batch doc by accepted spans
      val covAcc = coveredPositions(
          accSeed.select(col("__gh"), col("__id").as("__ida"), col("pos").as("__pa")),
          bgSeed.select(col("__gh"), col("__id").as("__idb"), col("pos").as("__pb")),
          l, lit(true))
        .groupBy(col("__idb")).agg(count(lit(1)).as("__cov"))
      val dropAccepted = covAcc
        .join(nw.withColumnRenamed("__id", "__idb"), Seq("__idb"))
        .where(col("__cov") * 1000000L >= col("__nw") * maxCoveragePpm)
        .select(col("__idb").as("__id")).distinct()
        .localCheckpoint(true)
      val fresh = bgSeed.join(dropAccepted, Seq("__id"), "left_anti")
        .localCheckpoint(true)

      // 2. within-batch: coverage from LOWER-id fresh docs
      val covInner = coveredPositions(
          fresh.select(col("__gh"), col("__id").as("__ida"), col("pos").as("__pa")),
          fresh.select(col("__gh"), col("__id").as("__idb"), col("pos").as("__pb")),
          l, col("__ida") < col("__idb"))
        .groupBy(col("__idb")).agg(count(lit(1)).as("__cov"))
      val innerDrop = covInner
        .join(nw.withColumnRenamed("__id", "__idb"), Seq("__idb"))
        .where(col("__cov") * 1000000L >= col("__nw") * maxCoveragePpm)
        .select(col("__idb").as("__id")).distinct()
        .localCheckpoint(true)

      // 3. commit survivors' FULL gram rows (not just seed-eligible
      // ones: a gram above the cap today must still be probe-able
      // history tomorrow), purge dead incarnations, emit originals
      bg.join(dropAccepted.unionByName(innerDrop), Seq("__id"), "left_anti")
        .select(col("__id"), col("pos"), col("__gh"), col("__gp"))
        .write.mode("overwrite").partitionBy("__gp")
        .parquet(s"$indexPath/batch=$batchId")
      compactEvery.filter(_ > 0).foreach { every =>
        if ((batchId + 1) % every == 0) { compact(spark, indexPath, tiered = true); () }
      }
      val dropIds = dropAccepted.unionByName(innerDrop)
        .select(col("__id").as(idCol))
      onSurvivors(batch.join(dropIds, Seq(idCol), "left_anti"), batchId)
    }
  }

  /** Bootstrap the gram index from an EXISTING accepted corpus: its
    * hashed gram rows land as a `compacted=-1` generation that batch 0
    * already dedups against — the [[StreamingDedup.seedIndex]] device.
    * `l` MUST match the gate's.
    */
  def seedIndex(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, l: Int = 8): Unit = {
    val spark = docs.sparkSession
    val dir = s"$indexPath/compacted=-1"
    // manifest entry out before the overwrite, back via touchCommit —
    // a re-seed must hide the half-written generation (the BatchIndex
    // manifest contract)
    BatchIndex.manifestRemove(spark, indexPath, Seq("compacted=-1"))
    gramRows(docs, idCol, textCol, l)
      .write.mode("overwrite").partitionBy("__gp").parquet(dir)
    BatchIndex.touchCommit(spark, dir)
  }

  /** Fold historical batch directories — verdicts bit-identical, reads
    * open O(log) dirs. Safe beside live ingest with the default upTo.
    */
  def compact(spark: SparkSession, indexPath: String,
      upTo: Option[Long] = None, tiered: Boolean = false): Option[Long] =
    BatchIndex.compact(spark, indexPath, partitionCols = Seq("__gp"),
      upTo = upTo, tiered = tiered)
}
