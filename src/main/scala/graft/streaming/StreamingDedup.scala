package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.{MinHash, PairVerify}

/** Incremental near-dup dedup of a DOCUMENT STREAM — the ingest shape of
  * a continuously-growing training corpus: every micro-batch is deduped
  * against everything already accepted, survivors join the corpus, the
  * rest are dropped on arrival.
  *
  * Policy — greedy ONLINE dedup, the standard ingest behavior:
  *  1. accepted-first — a batch doc near-dup of any ACCEPTED doc drops;
  *  2. lowest-id-within-batch — among new near-dups of each other, the
  *     minimum id survives;
  *  3. docs too short to shingle (< ngram tokens) can never be near-dups
  *     and are always accepted (emitted, not indexed) — the same rows
  *     [[MinHash.dedupCorpus]] keeps.
  *
  * Equivalence to one-shot [[MinHash.dedupCorpus]] on the union holds
  * when ids arrive in increasing order AND every near-dup pair involves
  * a surviving doc (duplicate clusters centered on canonicals — the
  * common web-dedup shape). The deliberate divergence: when a DROPPED
  * doc is the only link between two otherwise-dissimilar docs (b≈a
  * dropped in batch 1; later c≈b but c≉a — Jaccard is not transitive),
  * the online policy KEEPS c (it is compared against accepted docs
  * only), while one-shot dedup over the union would drop it. Online
  * keeps strictly more data and never drops a doc without an accepted
  * witness; re-running batch dedup over the accepted corpus converges
  * the two.
  *
  * State is the persisted minhash corpus index ([[MinHash.corpusIndex]]
  * rows) laid out one directory per micro-batch
  * (`<indexPath>/batch=<id>`, overwrite) — a foreachBatch RETRY
  * rewrites its own directory instead of double-appending (idempotent,
  * at-least-once safe), a restart resumes against the full accepted
  * corpus with zero recovery logic, and directories from a dead
  * incarnation (ids beyond the current batch after a checkpoint reset)
  * are purged on write so the index tree never carries phantom docs.
  *
  * 100 TB shape: per batch the work is banding the batch (tiny) against
  * the stored index's bands (map-only explode of stored signatures — no
  * re-shingling of history, the index IS the state), one bucket
  * equi-join, and exact verify on candidates only; the drop-sets are
  * localCheckpointed so the verify joins run ONCE per batch (not once
  * per consumer). The accepted corpus never re-scans its raw documents.
  */
object StreamingDedup {

  /** Run the incremental dedup; `onSurvivors` receives each batch's
    * ACCEPTED original rows (full input schema) plus the batchId.
    */
  def run(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      ngram: Int = 3,
      k: Int = 128,
      b: Int = 32,
      r: Int = 4,
      seed: Long = 42L,
      num: Int = 8,
      den: Int = 10)(onSurvivors: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    require(b * r <= k, s"b*r must not exceed k: $b*$r > $k")
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val batchIdx = MinHash.corpusIndex(batch, idCol, textCol, ngram, k, seed)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // purge dead-incarnation state BEFORE reading accepted state
        // (review r13 pass 5 — the CurationGate ordering): leftovers
        // beyond this batch id must not serve as phantom accepted rows
        purgeBeyond(spark, indexPath, batchId)
        BatchIndex.purgeBeyond(spark, DedupStage.bandsPath(indexPath), batchId)
        // signature tree read only for (__id, __sh) (exact verify); the
        // banding probe runs against the precomputed bucket-partitioned
        // band tree, pruned to the batch's touched partitions
        val accepted = readIndex(spark, indexPath, batchIdx, beforeBatch = batchId)
        val acceptedBands = DedupStage.readBands(spark, indexPath,
          DedupStage.bandRows(batchIdx, b, r), beforeBatch = batchId)
        // 1. accepted-first rule — the [[DedupStage]] protocol shared
        // with CurationGate: any batch doc near-dup of an accepted doc
        // drops (drop set localCheckpointed inside, computed once)
        val dupOfAccepted = DedupStage.dupOfAccepted(
          batchIdx, acceptedBands, accepted, b, r, num, den)
        val fresh = batchIdx.join(dupOfAccepted, Seq("__id"), "left_anti")

        // 2. within-batch: keep the lowest id of each near-dup cluster
        val innerCands = MinHash.candidatePairs(
          fresh.select(col("__id"), col("__sig")), "__id", "__sig", b, r)
        val innerDrop = PairVerify.exact(innerCands, fresh.select(col("__id"), col("__sh")), num, den)
          .select(col("id_b").as("__id")).distinct()
          .localCheckpoint(true)

        // 3. commit this batch's accepted index rows (overwrite = retry-
        // idempotent), purge dead-incarnation leftovers, then emit the
        // surviving ORIGINAL rows — anti-join against the drop sets, so
        // short un-shingleable docs (never indexed, never droppable)
        // pass through like dedupCorpus's anti-join keeps them
        fresh.join(innerDrop, Seq("__id"), "left_anti")
          .select(col("__id"), col("__sh"), col("__sig"))
          .write.mode("overwrite").parquet(s"$indexPath/batch=$batchId")
        // band the just-written batch into the band tree (batch-sized,
        // retry-idempotent like the signature write it mirrors)
        DedupStage.commitBands(spark, indexPath, batchId, b, r, batchIdx)
        val dropIds = dupOfAccepted.unionByName(innerDrop).select(col("__id").as(idCol))
        onSurvivors(batch.join(dropIds, Seq(idCol), "left_anti"), batchId)
      } finally { batchIdx.unpersist(); () }
    }
  }

  /** Bootstrap an ingest tree from an EXISTING accepted corpus (the
    * batch-curated corpus a production stream takes over from): the
    * rows — [[MinHash.corpusIndex]] output, the exact shape the per-
    * batch dirs hold — are written as a consolidated generation BELOW
    * every future batch id (`compacted=-1`), so the stream's very first
    * batch (id 0) already dedups against them. Works for any consumer
    * of this index layout ([[CurationGate]] shares it). Call before
    * the stream starts, on an empty tree.
    */
  def seedIndex(index: DataFrame, indexPath: String, b: Int = 32, r: Int = 4): Unit = {
    val spark = index.sparkSession
    // manifest entries out before each overwrite, back via touchCommit
    // (the BatchIndex manifest contract — a re-seed of a previously
    // seeded tree must hide the half-written generation from manifest
    // readers exactly as the marker protocol hides it)
    BatchIndex.manifestRemove(spark, indexPath, Seq("compacted=-1"))
    index.write.mode("overwrite").parquet(s"$indexPath/compacted=-1")
    BatchIndex.touchCommit(spark, s"$indexPath/compacted=-1")
    // the seed's band rows, bucket-partitioned like every batch's —
    // b and r MUST match the gate the tree feeds ([[run]]'s / a
    // [[CurationGate.Config]]'s values), or banding verdicts diverge
    val bdir = s"${DedupStage.bandsPath(indexPath)}/compacted=-1"
    BatchIndex.manifestRemove(spark, DedupStage.bandsPath(indexPath), Seq("compacted=-1"))
    DedupStage.bandRows(spark.read.parquet(s"$indexPath/compacted=-1"), b, r)
      .write.mode("overwrite").partitionBy("__bp").parquet(bdir)
    BatchIndex.touchCommit(spark, bdir)
  }

  /** Fold historical batch directories into one consolidated
    * [[BatchIndex]] generation — dedup verdicts of every later batch
    * are bit-identical (the index ROWS are unchanged, only their
    * layout), but each batch's accepted-index read opens one directory
    * plus the batches newer than it instead of every directory ever
    * written. Safe beside live ingest with the default `upTo`.
    */
  def compact(spark: SparkSession, indexPath: String,
      upTo: Option[Long] = None, tiered: Boolean = false): Option[Long] = {
    BatchIndex.compact(spark, DedupStage.bandsPath(indexPath),
      partitionCols = Seq("__bp"), upTo = upTo, tiered = tiered)
    BatchIndex.compact(spark, indexPath, upTo = upTo, tiered = tiered)
  }

  // index layout shared with StreamingPhashDedup — see [[BatchIndex]]
  private def purgeBeyond(spark: SparkSession, indexPath: String, batchId: Long): Unit =
    BatchIndex.purgeBeyond(spark, indexPath, batchId)

  private def readIndex(
      spark: SparkSession,
      indexPath: String,
      template: DataFrame,
      beforeBatch: Long): DataFrame =
    BatchIndex.read(spark, indexPath, template, beforeBatch)
}
