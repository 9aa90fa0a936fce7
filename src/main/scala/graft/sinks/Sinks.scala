package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Sinks: console (append + changelog/update), named tables + INSERT
  * INTO, and show/print.
  *
  * Reference capabilities:
  *  - K1 named `print` sink + `INSERT INTO`
  *    (flink playground `WithDeduplicateJoinJob.java:70-77,88`);
  *  - K2 append print (`DataStreamJob.java:123` toDataStream().print());
  *  - K3 changelog print (`WithStateTtlJob.java:90` toChangelogStream()
  *    .print()) — update mode emits upserts; FULL +I/-U/+U/-D retraction
  *    streams are produced by [[graft.streaming.Changelog]] (per-batch
  *    snapshot diff), closing the SURVEY §7.4 divergence;
  *  - K4 execute().print() (`TableAPIJob.java:89-90`) — `df.show()`.
  */
object Sinks {

  /** K2: append-only console stream with a label (queryName). */
  def consoleAppend(df: DataFrame, label: String): DataStreamWriter[Row] =
    df.writeStream.format("console").outputMode(OutputMode.Append()).queryName(label)

  /** K3: changelog/update-mode console stream with a label. */
  def consoleUpdate(df: DataFrame, label: String): DataStreamWriter[Row] =
    df.writeStream.format("console").outputMode(OutputMode.Update()).queryName(label)

  /** K1 (batch): register a named parquet-backed sink table. */
  def createSinkTable(spark: SparkSession, name: String, path: String, ddlSchema: String): Unit =
    spark.sql(s"CREATE TABLE IF NOT EXISTS $name ($ddlSchema) USING parquet LOCATION '$path'")

  /** K1 (batch): INSERT INTO a named sink table. */
  def insertInto(df: DataFrame, table: String): Unit =
    df.write.mode("append").insertInto(table)

  /** K1 (streaming): route a stream into a named in-memory sink table,
    * queryable as `SELECT * FROM <name>` — the test-visible equivalent of
    * the reference's print table.
    */
  def memorySink(df: DataFrame, name: String, update: Boolean = false): StreamingQuery =
    df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(if (update) OutputMode.Update() else OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0L))
      .start()

  /** K4: collect-and-print (blocking, driver-side — debug only). */
  def print(df: DataFrame, numRows: Int = 20): Unit = df.show(numRows, truncate = false)
}
