package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling: per-column non-null and exact distinct
  * counts in ONE pass, emitted as a long-format stats table — the
  * dataset-audit stage that runs before a corpus is admitted to a
  * pipeline (schema drift, null regressions, key-cardinality checks).
  *
  * Shape at scale: a single global aggregation; Spark plans the N
  * `count(DISTINCT col)`s via one Expand (N-way map-side row expansion)
  * + partial aggregation, so the shuffle carries per-column partial
  * distinct sets, not rows. The `stack` to long format is a map-side
  * transpose of a single 1-row result. Exact distinct on a high-card
  * column is inherently a big partial state — swap in HLL++
  * (`approx_count_distinct`, the q47 exhibit) when audit tolerance
  * allows; both shapes share this operator's plan otherwise.
  */
object Profile {

  /** Long-format profile of `cols`: (column_name, n_nonnull, n_distinct)
    * one row per column, sorted by column_name.
    */
  def summarize(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.forall(df.columns.contains),
      s"columns not all present: $cols vs ${df.columns.mkString(",")}")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      countDistinct(col(c)).as(s"__nd_$c")))
    val stacked = cols.map(c => s"'$c', __nn_$c, __nd_$c").mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${cols.size}, $stacked) AS (column_name, n_nonnull, n_distinct)")
      .orderBy(col("column_name"))
  }
}
