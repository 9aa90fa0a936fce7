package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keep-latest / keep-first deduplication.
  *
  * Reference capability: the ROW_NUMBER-over-key dedup view
  * (flink playground `WithDeduplicateJoinJob.java:89-97`) and the
  * primary-key upsert view (`WithStateTtlJob.java:73-77`) — both reduce a
  * changelog to its latest row per key.
  *
  * Spark-first design: a ranking window + `rn = 1` filter. Catalyst's
  * `InferWindowGroupLimit` rewrites this into `WindowGroupLimitExec`
  * (a per-partition top-1 pushed *before* the shuffle), so at scale this
  * is one shuffle by key with map-side group-limit — no full sort of the
  * table, no state beyond one row per key per partition. The streaming
  * form lives in [[graft.streaming.KeepLatest]].
  */
object Dedup {

  /** Latest row per `keys`, "latest" = max by `orderBy` columns
    * (compared in order, descending). `orderBy` must be a deterministic
    * total order within a key (pass a unique tiebreaker last).
    */
  def keepLatest(df: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** First row per `keys` by ascending `orderBy`. */
  def keepFirst(df: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy.map(_.asc): _*)
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** Exact duplicate removal on a set of columns (hash groupBy).
    * Equivalent to `dropDuplicates` but with a deterministic survivor:
    * the row with the smallest `tiebreak`.
    */
  def exact(df: DataFrame, on: Seq[String], tiebreak: Column): DataFrame =
    keepFirst(df, on, Seq(tiebreak))
}
