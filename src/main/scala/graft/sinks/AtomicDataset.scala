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
  *
  * The marker check is EAGER but the returned frame is lazy, so a
  * rebuild can begin between [[read]] and the first action. [[read]]
  * therefore SNAPSHOTS the leaf-file listing at call time (review r13
  * pass 5): the frame reads exactly the files that existed under the
  * verified marker — a later rebuild's deletions fail the action LOUD
  * (FileNotFoundException under Spark's default ignoreMissingFiles)
  * and its new files are invisible, so the reader sees the complete
  * old artifact or an error, never a silent mix of two builds.
  */
object AtomicDataset {

  /** Shared with [[graft.streaming.BatchIndex.CommitMarker]] — ONE
    * on-disk convention (q169's scaladoc calls this "the BatchIndex
    * marker protocol on a one-shot artifact"); the marker I/O stays
    * local because [[graft.streaming.BatchIndex.touchCommit]] also
    * records the dir in a parent `_MANIFEST`, which a standalone
    * dataset root must not grow.
    */
  val CommitMarker: String = graft.streaming.BatchIndex.CommitMarker

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

  /** Read `<root>/<sub>`, refusing a torn (unmarked) artifact; the
    * file set is snapshotted under the marker check (class doc).
    * `basePath` keeps partition-column inference intact for
    * `partitionBy` layouts (q169's `data/out_shard=` dirs).
    */
  def read(spark: SparkSession, root: String, sub: String): DataFrame = {
    if (!isCommitted(spark, root))
      throw new IllegalStateException(
        s"dataset at $root is not commit-marked ($CommitMarker missing) — " +
          "a build crashed mid-write or is in progress; re-run the build")
    val dir = new Path(s"$root/$sub")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val f = it.next().getPath
      if (!f.getName.startsWith("_") && !f.getName.startsWith("."))
        files += f.toString
    }
    spark.read.option("basePath", s"$root/$sub").parquet(files.toSeq: _*)
  }
}
