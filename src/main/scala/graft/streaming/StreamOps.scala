package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.WindowAgg

/** Streaming forms of the reference's query shapes.
  *
  * The reference is processing-time everywhere (no event time, no
  * watermarks — SURVEY §2.9 T1); Spark's micro-batch model needs
  * watermarks wherever state must be bounded. The mapping, per operator:
  *
  *  - window agg (W3/A1): watermark on the ingest timestamp, update-mode
  *    emission ≈ the reference's changelog prints
  *    (`WindowsProctimeAggJob.java:84` toChangelogStream);
  *  - stream-stream left outer join (J3): Spark requires a watermark +
  *    time-range condition for state cleanup; the bound plays the role of
  *    the reference's state TTL (`WithStateTtlJob.java:80` — STATE_TTL
  *    hint on both sides);
  *  - keep-latest dedup (W2/T4): [[KeepLatest]];
  *  - changelog sinks (K3): update-mode console/memory emit upserts;
  *    [[Changelog]] emits the full +I/-U/+U/-D retraction stream via
  *    per-batch snapshot diffs (SURVEY §7.4 hard part #2, closed).
  */
object StreamOps {

  /** Streaming tumbling-window aggregation (update mode downstream).
    * `delay` is the watermark (≈0 for pure processing time — the
    * reference never handles late data).
    */
  def tumble(
      stream: DataFrame,
      tsCol: String,
      duration: String,
      delay: String,
      keys: Seq[String],
      aggs: Seq[Column]): DataFrame =
    WindowAgg.tumble(stream.withWatermark(tsCol, delay), tsCol, duration, keys, aggs)

  /** Processing-time temporal enrich (J1/T2 streaming form): left-join a
    * probe STREAM against the latest-version-per-key view of a BATCH
    * dimension (stream-static join). Spark re-evaluates the static side
    * every micro-batch, so each batch sees the dimension "as of now" —
    * the reference's TemporalTableFunction semantics
    * (`DataStreamJob.java:88-104`: "enrich a stream with a dimension
    * table (last/current value)").
    *
    * State story matches the asymmetric STATE_TTL intent
    * (`WithDeduplicateJoinJob.java:98`, probe '0h' / build '90d'):
    * stream-static joins keep NO probe state (each batch joins and
    * forgets), and the build side is a snapshot, not join state.
    *
    * File-backed dimensions pin their file listing for the lifetime of
    * the streaming query; use [[enrichLatestEachBatch]] when the
    * dimension is replaced while the query runs.
    */
  def enrichLatest(
      probeStream: DataFrame,
      dim: DataFrame,
      probeKey: String,
      dimKey: String,
      dimOrder: Seq[Column]): DataFrame = {
    val latest = graft.operators.Dedup.keepLatest(dim, Seq(dimKey), dimOrder)
    probeStream.join(latest, probeStream(probeKey) === latest(dimKey), "left_outer")
  }

  /** Refreshing variant of [[enrichLatest]]: `dimProvider` is invoked
    * once per micro-batch inside `foreachBatch`, so each batch joins the
    * dimension "as of now" even when its backing files are replaced —
    * the full TemporalTableFunction behavior. `sink` receives each
    * enriched micro-batch (write it, merge it, publish it).
    */
  def enrichLatestEachBatch(
      probeStream: DataFrame,
      dimProvider: () => DataFrame,
      probeKey: String,
      dimKey: String,
      dimOrder: Seq[Column])(sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    probeStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val latest = graft.operators.Dedup.keepLatest(dimProvider(), Seq(dimKey), dimOrder)
      sink(batch.join(latest, batch(probeKey) === latest(dimKey), "left_outer"), batchId)
    }

  /** Stream-stream LEFT OUTER equi-join bounded by time: right rows match
    * left rows within [leftTs - bound, leftTs + bound]. The bound is the
    * state-TTL analog: both sides' state is evicted once the watermark
    * passes the bound (the reference bounds the same state with
    * STATE_TTL, `WithDeduplicateJoinJob.java:98`).
    */
  def leftOuterWithin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      delay: String,
      bound: String): DataFrame = {
    val l = left.withWatermark(leftTs, delay)
    val r = right.withWatermark(rightTs, delay)
    // side-qualified references: unqualified col() would be ambiguous (or
    // silently wrong) when both streams share key/timestamp column names
    l.join(
      r,
      l(leftKey) === r(rightKey) &&
        r(rightTs) >= l(leftTs) - expr(s"INTERVAL $bound") &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $bound"),
      "left_outer")
  }
}
