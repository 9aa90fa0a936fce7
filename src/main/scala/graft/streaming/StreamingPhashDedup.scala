package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.{Multimodal, SimHash}

/** Incremental perceptual-hash dedup of a MEDIA STREAM — the image
  * analogue of [[StreamingDedup]]: every micro-batch of binary payloads
  * is screened against everything already accepted (re-encodes and
  * near-identical images drop on arrival), survivors' fingerprints join
  * the accepted index.
  *
  * Policy — the same greedy ONLINE rules as [[StreamingDedup]]:
  *  1. accepted-first — a batch image within `maxHamming` of any
  *     ACCEPTED image drops;
  *  2. lowest-id-within-batch — among new near-dups of each other, the
  *     minimum id survives;
  *  3. degenerate payloads (aHash fingerprint 0 — empty/uniform media)
  *     can never pair and are always accepted (emitted, not indexed).
  *
  * State is tiny compared to the text gate: ONE long per accepted image
  * (the aHash64 fingerprint) in [[BatchIndex]]'s idempotent
  * one-directory-per-batch layout — retry-safe overwrite, restart
  * resumes from the directory tree, dead-incarnation purge on write.
  *
  * 100 TB shape: per batch the work is hashing the batch payloads
  * scan-side (the payload never leaves the scan), exploding
  * (maxHamming+1) pigeonhole chunk keys per fingerprint, one bucket
  * equi-join against the accepted chunk index, and an INLINE
  * bit_count verify on candidate rows ([[SimHash.incrementalDrops]] —
  * no second verify join; the fingerprint is the full evidence).
  * History×history candidates are never generated.
  */
object StreamingPhashDedup {

  /** Run the incremental media dedup; `onSurvivors` receives each
    * batch's ACCEPTED original rows (full input schema) plus the
    * batchId. Ids must be long-castable and fresh per ingest (disjoint
    * from history — [[SimHash.incrementalDrops]]'s precondition).
    */
  def run(
      media: DataFrame,
      idCol: String,
      payloadCol: String,
      indexPath: String,
      maxHamming: Int = 3)(onSurvivors: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    media.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val fps = batch
        .select(col(idCol).cast("long").as("__id"),
          Multimodal.aHash(col(payloadCol)).as("__fp"))
        .where(col("__fp") =!= 0L)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // purge dead-incarnation state BEFORE reading accepted state
        // (review r13 pass 5 — the CurationGate ordering)
        BatchIndex.purgeBeyond(spark, indexPath, batchId)
        val accepted = BatchIndex.read(spark, indexPath, fps, beforeBatch = batchId)
        // drop set materialized once (localCheckpoint) — it feeds both
        // the index write and the survivor emit
        val drops = SimHash.incrementalDrops(accepted, fps, "__id", "__fp", maxHamming)
          .localCheckpoint(true)
        fps.join(drops, Seq("__id"), "left_anti")
          .write.mode("overwrite").parquet(s"$indexPath/batch=$batchId")
        onSurvivors(
          batch.join(drops.select(col("__id").cast("long").as(idCol)), Seq(idCol), "left_anti"),
          batchId)
      } finally { fps.unpersist(); () }
    }
  }
}
