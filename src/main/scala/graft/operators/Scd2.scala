package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history building: collapse a
  * change-event stream into per-key `[effective_from, effective_to)`
  * state intervals, dropping runs of consecutive identical states.
  *
  * The warehouse pattern behind versioned dimension tables (and the batch
  * twin of the reference's versioned upsert views, flink playground
  * `DataStreamJob.java:80-95`): a key's raw events become one row per
  * DISTINCT consecutive state, closed by the next change's timestamp and
  * open (`effective_to` NULL, `is_current` true) on the last.
  *
  * Shape at scale: one shuffle on the key; both window passes (the lag
  * that finds change points and the lead that closes intervals) share the
  * same partitioning and sort order, so Catalyst plans a single Exchange
  * + sort. Per-key history lives in one task — keys are many and rows per
  * key bounded, the same contract as every ranking dedup here.
  *
  * Determinism: `orderCols` must be a TOTAL order per key (pass a unique
  * tiebreaker last, like the event id) — otherwise equal-timestamp events
  * could swap and flip which state "wins" a change point.
  */
object Scd2 {

  /** Build the type-2 history of `stateCol` per `keyCols`.
    * Output: keyCols ++ (state, effective_from, effective_to, is_current)
    * where the effective columns are the first `orderCols` column's value
    * at the change point / next change point (NULL effective_to = open).
    */
  def history(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
      stateCol: String, tsCol: String): DataFrame = {
    val key = keyCols.map(col)
    val w = Window.partitionBy(key: _*).orderBy(orderCols: _*)
    // lag over a STRUCT wrapper so "no previous row" (NULL struct) is
    // distinguishable from "previous state is NULL" (non-NULL struct with
    // NULL field): a NULL state is a real state, runs of it collapse, and
    // the first row per key always opens an interval
    val changes = df
      .withColumn("__prev", lag(struct(col(stateCol).as("s")), 1).over(w))
      .where(col("__prev").isNull || !(col(stateCol) <=> col("__prev.s")))
    changes
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .select(key ++ Seq(
        col(stateCol).as("state"),
        col(tsCol).as("effective_from"),
        col("effective_to"),
        col("effective_to").isNull.as("is_current")): _*)
  }
}
