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
  * Policy (matches [[MinHash.dedupCorpus]] when ids arrive in increasing
  * order, the normal ingest case):
  *  1. accepted-first — a batch doc near-dup of any ACCEPTED doc drops;
  *  2. lowest-id-within-batch — among new near-dups of each other, the
  *     minimum id survives.
  *
  * State is the persisted minhash corpus index ([[MinHash.corpusIndex]]
  * rows) laid out one directory per micro-batch
  * (`<indexPath>/batch=<id>`, overwrite) — so a foreachBatch RETRY
  * rewrites its own directory instead of double-appending (idempotent,
  * at-least-once safe), and a restart resumes against the full accepted
  * corpus with zero recovery logic.
  *
  * 100 TB shape: per batch the work is banding the batch (tiny) against
  * the stored index's bands (map-only explode of stored signatures — no
  * re-shingling of history, the index IS the state), one bucket
  * equi-join, and exact verify on candidates only. The accepted corpus
  * never re-scans its raw documents.
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
        val accepted = readIndex(spark, indexPath, batchIdx, beforeBatch = batchId)
        // 1. cross candidates: batch bands vs accepted bands — one bucket
        // equi-join; verify exactly; any hit drops the batch doc
        val bb = MinHash.bands(batchIdx.select(col("__id"), col("__sig")), "__sig", b, r)
          .select(col("__id"), col("band"), col("bucket"))
        val ab = MinHash.bands(accepted.select(col("__id"), col("__sig")), "__sig", b, r)
          .select(col("__id"), col("band"), col("bucket"))
        val crossCands = bb.select(col("__id").as("id_a"), col("band"), col("bucket"))
          .join(ab.select(col("__id").as("id_b"), col("band"), col("bucket")), Seq("band", "bucket"))
          .select(col("id_a"), col("id_b")).distinct()
        val sets = batchIdx.select(col("__id"), col("__sh"))
          .unionByName(accepted.select(col("__id"), col("__sh")))
        val dupOfAccepted = PairVerify.exact(crossCands, sets, num, den)
          .select(col("id_a").as("__id")).distinct()
        val fresh = batchIdx.join(dupOfAccepted, Seq("__id"), "left_anti")

        // 2. within-batch: keep the lowest id of each near-dup cluster
        val innerCands = MinHash.candidatePairs(
          fresh.select(col("__id"), col("__sig")), "__id", "__sig", b, r)
        val innerDrop = PairVerify.exact(innerCands, fresh.select(col("__id"), col("__sh")), num, den)
          .select(col("id_b").as("__id")).distinct()
        val survivors = fresh.join(innerDrop, Seq("__id"), "left_anti")

        // 3. commit this batch's accepted index rows (overwrite = retry-
        // idempotent), then emit the surviving ORIGINAL rows
        survivors.select(col("__id"), col("__sh"), col("__sig"))
          .write.mode("overwrite").parquet(s"$indexPath/batch=$batchId")
        val out = batch.join(
          survivors.select(col("__id").as(idCol)), Seq(idCol), "left_semi")
        onSurvivors(out, batchId)
      } finally { batchIdx.unpersist(); () }
    }
  }

  /** The accepted-corpus index: every batch directory with id <
    * `beforeBatch` (a retry of batch N must not dedup against its own
    * half-written output). Empty index when none exist yet.
    */
  private def readIndex(
      spark: SparkSession,
      indexPath: String,
      template: DataFrame,
      beforeBatch: Long): DataFrame = {
    val p = new Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs =
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.map(_.getPath.getName)
        .collect { case n if n.startsWith("batch=") => n.stripPrefix("batch=").toLong }
        .filter(_ < beforeBatch)
        .map(id => s"$indexPath/batch=$id")
    if (dirs.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[Row](), template.schema)
    else spark.read.schema(template.schema).parquet(dirs: _*)
  }
}
