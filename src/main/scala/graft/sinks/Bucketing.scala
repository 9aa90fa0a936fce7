package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — shuffle-free co-located joins.
  *
  * At 100 TB the dominant recurring cost of a fact-fact join (lineitem ⋈
  * orders, events ⋈ sessions) is re-shuffling both sides on every query.
  * Writing both tables bucketed BY THE JOIN KEY with the same bucket
  * count pre-partitions them once at write time: Spark's scan reports
  * the bucket hash-partitioning, and the join planner drops both
  * Exchange nodes — the join runs bucket-to-bucket, co-located.
  *
  * `sortBy` on the same key additionally pre-orders each bucket file so
  * a sort-merge join can skip its sorts on unsorted-spill-free reads.
  *
  * This is the write-once/join-many layout; for one-off joins prefer
  * AQE's runtime planning over paying the bucketed write.
  */
object Bucketing {

  /** Drop `tableName` AND clear its leftover managed location. A fresh
    * per-JVM metastore forgets managed tables, but their warehouse
    * directories survive the JVM — and Spark refuses to create a
    * managed table over an existing location (LOCATION_ALREADY_EXISTS),
    * so `mode("overwrite")` alone is not re-runnable across sessions.
    * Must run BEFORE the write, never after: downstream DataFrames stay
    * lazily bound to the table until their action runs.
    */
  def resetManagedTable(spark: SparkSession, tableName: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      tableName.toLowerCase(java.util.Locale.ROOT))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Write `df` as a managed parquet table bucketed+sorted by `key`. */
  def writeBucketed(df: DataFrame, tableName: String, key: String, buckets: Int): Unit = {
    resetManagedTable(df.sparkSession, tableName)
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(tableName)
  }

  /** Join two same-bucketed tables on their bucket key. With matching
    * bucket counts the planner produces a zero-Exchange join (asserted
    * by PlanSpec).
    */
  def coLocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      leftKey: String,
      rightKey: String,
      joinType: String = "inner"): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey), joinType)
  }
}
