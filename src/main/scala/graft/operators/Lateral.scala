package graft.operators

import org.apache.spark.sql.DataFrame

/** Fluent lateral joins (J5).
  *
  * Reference capability: `people.leftOuterJoinLateral(call(ttf,
  * proctime))` (flink playground `LateralWithTableAPIJob.java:99-103`) —
  * the fluent twin of SQL `LEFT JOIN LATERAL ... ON TRUE`
  * (`DataStreamJob.java:116-120`).
  *
  * Spark-first: `Dataset.lateralJoin` (Spark 4+). The right side
  * references left columns via `col("l.x").outer()` (alias the left as
  * `l` first). Supported correlated shapes: filters, projections, and
  * TVFs (`spark.tvf.explode*`); a correlated AGGREGATE under the lateral
  * is not yet resolvable through the DataFrame API — use the SQL form
  * for that (ParityQueries q21), which plans identically.
  */
object Lateral {

  /** LEFT JOIN LATERAL: every left row survives; unmatched right side
    * null-pads (the reference's ON TRUE form).
    */
  def leftOuter(left: DataFrame, subquery: DataFrame): DataFrame =
    left.lateralJoin(subquery, "left")

  /** INNER JOIN LATERAL: left rows with empty subquery output drop. */
  def inner(left: DataFrame, subquery: DataFrame): DataFrame =
    left.lateralJoin(subquery)
}
