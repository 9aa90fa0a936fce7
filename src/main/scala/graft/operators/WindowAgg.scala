package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tumbling-window aggregation (windowing TVF).
  *
  * Reference capability: `TABLE(TUMBLE(TABLE input, DESCRIPTOR(ts),
  * INTERVAL '1' MINUTES))` + `GROUP BY iso, capital, window_start,
  * window_end, window_time` + `count(*)`
  * (flink playground `WindowsProctimeAggJob.java:65-81`).
  *
  * Spark-first: the native `window()` function, which Catalyst turns into
  * a plain hash aggregate over a derived bucket column — partial (map-side)
  * aggregation then one shuffle by (window, keys). `window_time` is the
  * reference's row event-time attribute for the window: window_end - 1ms.
  */
object WindowAgg {

  /** Tumble `df` by `duration` on `tsCol`, group by `keys`, apply `aggs`.
    * Output keeps the grouping keys plus `window_start`, `window_end`,
    * `window_time` (all TIMESTAMP) plus the aggregates.
    */
  def tumble(
      df: DataFrame,
      tsCol: String,
      duration: String,
      keys: Seq[String],
      aggs: Seq[Column]): DataFrame = {
    val grouped = df
      .groupBy((window(col(tsCol), duration) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
    val aggCols = grouped.columns.filterNot(c => c == "window" || keys.contains(c)).toSeq
    grouped.select(
      (keys.map(col) ++ Seq(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        (col("window.end") - expr("INTERVAL 1 MILLISECOND")).as("window_time")) ++
        aggCols.map(col)): _*)
  }
}
