package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional scan pruning.
  *
  * Parquet readers skip row groups whose column min/max stats exclude
  * the query predicate. A linear sort clusters ONE column: filters on
  * the sort key prune well, filters on any other column prune nothing
  * (every row group spans the full domain of the second column). At
  * 100 TB with two common filter columns (e.g. time AND tenant, part
  * AND supplier), linear layout forces a full scan for half the
  * workload.
  *
  * Z-ordering sorts by the bit-interleave of the columns' rank-scaled
  * values: the curve visits points in an order that keeps BOTH
  * coordinates locally clustered, so every row group covers a small
  * rectangle of the 2-D domain and min/max stats prune on either (or
  * both) predicates. The classic trade: each single dimension prunes
  * somewhat worse than its dedicated linear sort, every other dimension
  * prunes enormously better.
  *
  * Scale mechanics:
  *  - normalization is min/max scaling to 16 bits per dimension from a
  *    single tiny agg (two scan passes total — same cost shape as any
  *    stats-collecting writer, e.g. Delta's OPTIMIZE ZORDER);
  *  - the interleave is pure bit arithmetic on codegen'd builtins
  *    (shiftleft/or/mask) — no UDF, no driver work beyond 4 scalars;
  *  - `repartitionByRange(morton)` + in-partition sort gives
  *    globally-ordered files, so file-level AND row-group-level stats
  *    both stay tight.
  *
  * The pruning win is asserted by a test comparing parquet scan output
  * rows (post row-group skip) for a 2-D predicate on z-ordered vs.
  * linearly-sorted copies of the same data.
  */
object Layout {

  /** Spread the low 16 bits of `c` so bit i lands at position 2i
    * (the even-bit half of a 32-bit Morton code).
    */
  private[graft] def spreadBits(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
    x
  }

  /** Morton code of two 16-bit scaled values (a in even bits, b in odd). */
  private[graft] def morton2(a16: Column, b16: Column): Column =
    spreadBits(a16).bitwiseOR(shiftleft(spreadBits(b16), 1))

  /** Min/max scale a numeric column to [0, 65535] as LONG. Degenerate
    * (constant) columns scale to 0 — the interleave then just sorts by
    * the other dimension.
    */
  private def scale16(c: Column, mn: Long, mx: Long): Column =
    if (mx <= mn) lit(0L)
    else {
      // double arithmetic on purpose: (c - mn) * 65535 in LONG overflows
      // once the range exceeds ~1.4e14 (ANSI mode: the write job dies) —
      // epoch-micros columns spanning a few years are past that. A
      // positive-constant scale + floor is monotone in IEEE doubles,
      // which is all a 16-bit layout rank needs, and the result is
      // provably in [0, 65535] (the scale factor's rounding error can't
      // push range * s to 65536 before the floor).
      val s = 65535.0 / (mx - mn).toDouble
      floor((c.cast("double") - lit(mn.toDouble)) * lit(s)).cast("long")
    }

  /** Write `df` to `path` as parquet z-ordered on two numeric columns.
    *
    * `files` bounds the file count; `rowGroupBytes` sets the parquet
    * block size (smaller groups = finer pruning granularity, more stats
    * overhead — the default trades for scan-heavy workloads).
    */
  def zorderWrite(
      df: DataFrame,
      colA: String,
      colB: String,
      path: String,
      files: Int,
      rowGroupBytes: Long = 1L << 20): Unit = {
    require(files >= 1, s"files must be >= 1, got $files")
    // single tiny agg: 4 scalars to the driver (stats collection, not a
    // data collect)
    val stats = df.agg(
      min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).head()
    val (minA, maxA, minB, maxB) =
      (stats.getLong(0), stats.getLong(1), stats.getLong(2), stats.getLong(3))
    val z = morton2(scale16(col(colA), minA, maxA), scale16(col(colB), minB, maxB))
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
      .parquet(path)
  }

  /** Write `df` linearly sorted on one column — the comparison layout. */
  def sortedWrite(
      df: DataFrame,
      sortCol: String,
      path: String,
      files: Int,
      rowGroupBytes: Long = 1L << 20): Unit = {
    require(files >= 1, s"files must be >= 1, got $files")
    df.repartitionByRange(files, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
      .parquet(path)
  }
}
