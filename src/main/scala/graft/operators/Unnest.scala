package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Outer UNNEST (correlated array explode preserving empty/null parents).
  *
  * Reference capability: `LEFT OUTER JOIN UNNEST(input.items) AS
  * T(item_id) ON TRUE` where the row `("b", [])` must survive with a NULL
  * item (flink playground `CrossJoinJob.java:47-71`).
  *
  * Spark-first: `explode_outer`, a native Generator — runs inside
  * whole-stage codegen, no shuffle, no join. `unnest` (inner) drops
  * empty-array parents, matching plain UNNEST.
  */
object Unnest {

  /** Outer-unnest `arrayCol` into a column named `as`, keeping all other
    * columns. Empty/null arrays yield one row with NULL.
    */
  def outer(df: DataFrame, arrayCol: Column, as: String): DataFrame =
    df.withColumn(as, explode_outer(arrayCol))

  /** Inner unnest: empty/null arrays drop their parent row. */
  def inner(df: DataFrame, arrayCol: Column, as: String): DataFrame =
    df.withColumn(as, explode(arrayCol))
}
