package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The BUCKETED cell layout shared by every persisted IVF assign tree —
  * one-shot ([[Ivf.writeIndex]]) and streamed
  * ([[graft.streaming.StreamingIvf]]) alike.
  *
  * Two physical layouts exist, one fixed per tree/generation root:
  *
  *  - LEGACY (default): `centroid_id=<c>` partition directories — exact
  *    PartitionFilters prune at list granularity, but the directory
  *    count grows WITH k. At the k ~ √n production sizing (k = 10⁶
  *    lists over a 10¹²-vector corpus) a dir-per-list tree is unusable:
  *    every write fans out to k directories and every plan pays a
  *    k-entry listing.
  *  - BUCKETED: `__cp = pmod(centroid_id, P)` partition directories with
  *    P FIXED (64 — the `DedupStage.BucketPartitions` convention), the
  *    real centroid id carried as a DATA column with rows SORTED by it
  *    within each write task, so parquet row-group min/max stats serve
  *    the fine-grained prune UNDER the `__cp` PartitionFilters prune.
  *    Directory count stays O(P) however large k grows. A probe of
  *    nprobe lists reads ≤ min(nprobe, P) bucket partitions and
  *    row-group-skips inside them.
  *
  * The layout is recorded by a `_CP=<P>` marker file in the tree root,
  * written together with the data (and, for streamed generations,
  * before the `_GEN` switch publishes them), and resolved per root by
  * every writer and every pruning reader — a root never mixes layouts.
  */
private[graft] object CellLayout {

  /** Fixed bucket count of the bucketed layout. */
  val DefaultBuckets = 64

  /** `_CP=`-prefixed root entries parsed to bucket counts; unparseable
    * marker-like junk (`_CP=`, `_CP=64.tmp` — rename artifacts, partial
    * multipart uploads) is IGNORED rather than allowed to brick every
    * read and write path with a NumberFormatException — the
    * `manifestVersions` junk-tolerance discipline.
    */
  private def markerValues(names: Seq[String]): Seq[Int] =
    names.filter(_.startsWith("_CP="))
      .flatMap(n => scala.util.Try(n.stripPrefix("_CP=").toInt).toOption)
      .distinct

  /** The root's bucket count, None on a legacy dir-per-list root —
    * resolved from the `_CP=<P>` marker. TWO distinct parseable markers
    * mean a writer crashed mid-layout-switch without resetMarker and a
    * retry wrote a different P: pruning `__cp` with the wrong modulus
    * silently drops valid neighbors, so this FAILS LOUD instead of
    * picking one by listing order.
    */
  def bucketsOf(spark: SparkSession, root: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val vals = markerValues(fs.listStatus(p).toSeq.map(_.getPath.getName))
      require(vals.size <= 1,
        s"conflicting _CP layout markers ${vals.sorted.mkString(", ")} under $root — " +
          "a layout-switching rewrite must clear stale markers (resetMarker); " +
          "remove the marker that does not match the data before querying")
      vals.headOption
    }
  }

  /** Create the `_CP=<P>` marker under `root`. */
  def writeMarker(spark: SparkSession, root: String, p: Int): Unit = {
    require(p >= 1, s"cell-layout bucket count must be >= 1, got $p")
    val m = new org.apache.hadoop.fs.Path(s"$root/_CP=$p")
    m.getFileSystem(spark.sparkContext.hadoopConfiguration).create(m, true).close()
  }

  /** Align `root`'s marker with the layout about to be written: create
    * it for a bucketed write, REMOVE any stale one for a legacy write —
    * an overwrite-in-place that switches layouts must not leave the old
    * marker pointing readers at a partition column the new data lacks.
    */
  def resetMarker(spark: SparkSession, root: String, buckets: Option[Int]): Unit = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(rootPath))
      fs.listStatus(rootPath).toSeq.map(_.getPath.getName)
        .filter(n => n.startsWith("_CP=") &&
          // delete every non-matching marker INCLUDING unparseable junk
          // (a reset is the one safe moment to clear it)
          !scala.util.Try(n.stripPrefix("_CP=").toInt).toOption.exists(buckets.contains))
        .foreach(n => fs.delete(new org.apache.hadoop.fs.Path(s"$root/$n"), false))
    buckets.foreach(writeMarker(spark, root, _))
  }

  /** (frame ready to write, partition columns) under the layout:
    * bucketed roots get the derived `__cp` column and partition by it
    * (rows sorted by centroid_id within each write task so row-group
    * stats carry the fine-grained prune); legacy roots partition by
    * `centroid_id` directly.
    */
  def forWrite(df: DataFrame, buckets: Option[Int]): (DataFrame, Seq[String]) =
    buckets match {
      case Some(p) =>
        // p = 0 would write every row under pmod-null
        // (__cp=__HIVE_DEFAULT_PARTITION__) and succeed SILENTLY, then
        // crash every query's bucketOf with a division by zero — fail
        // the build loudly instead (review r13)
        require(p >= 1, s"cell-layout bucket count must be >= 1, got $p")
        (df.withColumn("__cp", pmod(col("centroid_id"), lit(p.toLong)))
          .sortWithinPartitions(col("__cp"), col("centroid_id")), Seq("__cp"))
      case None => (df, Seq("centroid_id"))
    }

  /** The nonnegative bucket of a centroid id under a P-bucket layout —
    * matches Spark's `pmod` on the write side for any sign.
    */
  def bucketOf(centroidId: Long, p: Int): Int =
    java.lang.Math.floorMod(centroidId, p.toLong).toInt

  /** The probed-cells → partition-predicate hook for
    * [[Ivf.topKPruned]]: a bucketed root prunes on the `__cp` dirs the
    * probed lists map to (centroid_id remains a row-group-stats data
    * filter below it); a legacy root needs nothing extra — centroid_id
    * IS its partition column. `__cp` dir values are type-INFERRED as
    * int on read, so the In-literals are Ints.
    */
  def prune(buckets: Option[Int]): Seq[Long] => Option[Column] =
    buckets match {
      case Some(p) => ids =>
        Some(col("__cp").isin(ids.map(bucketOf(_, p)).distinct.map(Int.box): _*))
      case None => _ => None
    }
}
