package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness's parquet star schema (TESTDATA.md).
  *
  * One loader per table; `events` normalizes its nanosecond epoch column to
  * a microsecond timestamp (named `ts`, like the reference's versioned
  * dimension streams, flink playground `DataStreamJob.java:80`).
  *
  * Scale notes: these are plain parquet scans — Catalyst pushes filters and
  * prunes columns into the scan, so query code should never pre-select or
  * cache here. On a cluster the same loaders work on directory paths with
  * thousands of files; nothing is collected to the driver.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Events with `ts` as a microsecond TIMESTAMP.
    *
    * The parquet column is TIMESTAMP(NANOS) which Spark reads (under
    * `spark.sql.legacy.parquet.nanosAsLong=true`) as a raw long of nanos
    * since epoch; integer-dividing by 1000 truncates to microseconds,
    * exactly what DuckDB does when it reads the same file.
    */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events").withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Register all tables as temp views (events with converted ts). */
  def registerAll(s: SparkSession, d: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { n =>
      table(s, d, n).createOrReplaceTempView(n)
    }
    events(s, d).createOrReplaceTempView("events")
  }
}
