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
    // Unqualified names only: a qualified db.tbl lives under
    // <warehouse>/<db>.db/tbl, not <warehouse>/<db.tbl> — guessing would
    // delete a wrong/nonexistent path and leave the real leftover.
    require(!tableName.contains("."),
      s"resetManagedTable takes an unqualified table name, got '$tableName'")
    val cat = spark.sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(tableName)
    // Location resolution, in trust order: (1) the catalog's own metadata
    // when the table exists (and ONLY for MANAGED tables — deleting an
    // EXTERNAL table's location would destroy user data); (2) otherwise
    // the leftover dir of a forgotten managed table, which lives under
    // the CURRENT database's location (the fresh-metastore case this
    // helper exists for).
    val loc: Option[org.apache.hadoop.fs.Path] =
      if (cat.tableExists(ident)) {
        val meta = cat.getTableMetadata(ident)
        if (meta.tableType == org.apache.spark.sql.catalyst.catalog.CatalogTableType.MANAGED)
          Some(new org.apache.hadoop.fs.Path(meta.location))
        else None
      } else {
        val db = cat.getDatabaseMetadata(cat.getCurrentDatabase)
        Some(new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(db.locationUri),
          tableName.toLowerCase(java.util.Locale.ROOT)))
      }
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    loc.foreach { p =>
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
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
