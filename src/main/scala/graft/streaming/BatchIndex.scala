package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Idempotent per-micro-batch index layout shared by the incremental
  * ingest gates ([[StreamingDedup]] for text, [[StreamingPhashDedup]]
  * for media): the accepted-corpus state lives as one directory per
  * micro-batch (`<root>/batch=<id>`, written with overwrite), so
  *  - a foreachBatch RETRY rewrites its own directory instead of
  *    double-appending (at-least-once safe),
  *  - a restart resumes against the full accepted corpus with zero
  *    recovery logic (the directory tree IS the state),
  *  - directories from a dead incarnation (ids beyond the current
  *    batch after a checkpoint reset) are purged on write so the tree
  *    never carries phantom accepted rows.
  */
private[streaming] object BatchIndex {

  def batchDirIds(spark: SparkSession, indexPath: String): Seq[Long] = {
    val p = new Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("batch=") => n.stripPrefix("batch=").toLong }
  }

  /** Dead-incarnation purge: a reused indexPath with a reset checkpoint
    * restarts batchIds at 0 — directories beyond the current batch are
    * a previous run's corpse and would surface as phantom accepted rows.
    */
  def purgeBeyond(spark: SparkSession, indexPath: String, batchId: Long): Unit = {
    val p = new Path(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    batchDirIds(spark, indexPath).filter(_ > batchId)
      .foreach(id => fs.delete(new Path(s"$indexPath/batch=$id"), true))
  }

  /** The accepted-corpus index: every batch directory with id <
    * `beforeBatch` (a retry of batch N must not dedup against its own
    * half-written output). Empty frame of `template`'s schema when none
    * exist yet.
    */
  def read(
      spark: SparkSession,
      indexPath: String,
      template: DataFrame,
      beforeBatch: Long): DataFrame = {
    val dirs = batchDirIds(spark, indexPath).filter(_ < beforeBatch)
      .map(id => s"$indexPath/batch=$id")
    if (dirs.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[Row](), template.schema)
    else spark.read.schema(template.schema).parquet(dirs: _*)
  }
}
