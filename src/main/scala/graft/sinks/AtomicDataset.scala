package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Commit-marker protocol for multi-directory BATCH artifacts — the
  * [[graft.streaming.StreamingIvf]] batch-dir contract applied to
  * one-shot dataset builds (q169's `data/` + `manifest/` pair): a
  * `mode("overwrite")` parquet write is not atomic, so a crashed build
  * leaves a torn artifact indistinguishable from a complete one. The
  * protocol makes torn state DETECTABLE:
  *
  *  1. [[begin]] deletes the root's `_GRAFT_COMMIT` marker (a rewrite
  *     in progress immediately invalidates the previous artifact — a
  *     half-overwritten tree must never pass as the old version);
  *  2. the caller overwrites the artifact's directories;
  *  3. [[commit]] creates the marker AFTER every write completed.
  *
  * [[read]] refuses an unmarked root loudly. A crashed build leaves no
  * marker (readers refuse, the retry overwrites in place — same
  * idempotence as a foreachBatch retry); a crash between begin and the
  * first write leaves the PREVIOUS artifact's files but no marker —
  * refused too (conservative: the protocol cannot distinguish it from
  * a torn overwrite).
  */
object AtomicDataset {

  val CommitMarker = "_GRAFT_COMMIT"

  private def markerPath(root: String) = new Path(s"$root/$CommitMarker")

  def isCommitted(spark: SparkSession, root: String): Boolean = {
    val p = markerPath(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Invalidate the artifact before rewriting it. */
  def begin(spark: SparkSession, root: String): Unit = {
    val p = markerPath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, false); () }
  }

  /** Mark the artifact complete — call after EVERY directory's write. */
  def commit(spark: SparkSession, root: String): Unit = {
    val p = markerPath(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).create(p, true).close()
  }

  /** Read `<root>/<sub>`, refusing a torn (unmarked) artifact. */
  def read(spark: SparkSession, root: String, sub: String): DataFrame = {
    if (!isCommitted(spark, root))
      throw new IllegalStateException(
        s"dataset at $root is not commit-marked ($CommitMarker missing) — " +
          "a build crashed mid-write or is in progress; re-run the build")
    spark.read.parquet(s"$root/$sub")
  }
}
