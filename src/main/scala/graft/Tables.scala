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

  /** Events with `ts` as a microsecond TIMESTAMP (session-tz type).
    *
    * The testdata generator has shipped `ts` under two encodings:
    *   - TIMESTAMP(NANOS): Spark (with `nanosAsLong`) reads a raw LONG of
    *     nanos since epoch; integer-dividing by 1000 truncates to micros,
    *     exactly what DuckDB does reading the same file.
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads a native
    *     `timestamp_ntz`; under the UTC session timezone a cast to
    *     TimestampType is value-identical and keeps the loader's output
    *     type stable across encodings.
    * Branching on the ACTUAL schema type makes the loader robust to the
    * generator changing encodings between rounds (it did, round 5).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => df
      case org.apache.spark.sql.types.TimestampNTZType =>
        // under the UTC session timezone this cast is value-identical
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case other =>
        // a THIRD encoding drift (string, INT96, date, ...) must fail HERE
        // with a named cause, not silently null out 19 queries downstream
        throw new IllegalStateException(
          s"events.ts has unrecognized type $other — the testdata generator " +
            "changed the parquet encoding again; extend Tables.events with an " +
            "explicit value-preserving branch for it (see BASELINE.md encoding history)")
    }
  }

  /** Register all tables as temp views (events with converted ts). */
  def registerAll(s: SparkSession, d: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { n =>
      table(s, d, n).createOrReplaceTempView(n)
    }
    events(s, d).createOrReplaceTempView("events")
  }
}
