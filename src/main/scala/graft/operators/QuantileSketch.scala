package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile sketch — the missing member of the sketch family
  * (Count-Min, HyperLogLog, Misra–Gries, Bloom all ship with merge
  * laws). A fixed-universe dyadic HISTOGRAM sketch (the q-digest family
  * collapsed to one flat level) rather than KLL, a deliberate design
  * decision:
  *
  *  - KLL's compactors coin-flip (or alternate) which half of a full
  *    buffer survives, so the sketch CONTENT depends on the stream and
  *    merge ORDER. Spark's partial aggregation merges partition buffers
  *    in a nondeterministic order — a KLL-backed query could emit
  *    different estimates run to run, failing both the hash-exact
  *    oracle gate and the cross-parallelism determinism the registry
  *    holds everywhere else (q130's "identical at local[5]/local[16]"
  *    contract).
  *  - Cellwise-summed counters form an abelian group: merge order is
  *    irrelevant and the merge LAW holds as strict equality —
  *    sketch(A ++ B) == merge(sketch(A), sketch(B)), the same
  *    mergeable-summary property [[CountMin]] rides (PropertySpec
  *    asserts it cellwise).
  *
  * Guarantee (deterministic, not probabilistic): with `width` cells of
  * span 2^cellShift over the universe [0, width·2^cellShift), a rank-r
  * query returns the lower bound of the first cell whose cumulative
  * count reaches r. The TRUE rank-r order statistic lies inside that
  * cell — value error < 2^cellShift, and the residual rank uncertainty
  * is exactly the boundary cell's population (reported alongside the
  * estimate, so consumers can assert it; the PropertySpec law does,
  * against exact order statistics). KLL trades this fixed value error
  * for a distribution-free RANK error at equal space; on the bounded
  * integer domains the registry quantiles (lengths, scores, ppm rates
  * — all value-capped by construction), the fixed-universe trade is
  * strictly better AND deterministic.
  *
  * Scale shape: the buffer is the width-cell grid itself, so a corpus
  * aggregation shuffles one grid per partition per group — O(groups ·
  * width) rows total, corpus-size-independent (the CountMin property).
  * Out-of-universe values clamp into the edge cells (documented: edge
  * estimates saturate; size the universe to the column's contract).
  */
object QuantileSketch {

  /** Typed histogram-sketch aggregator: Long values into `width` cells
    * of span 2^cellShift; cell i counts values in
    * [i·2^cellShift, (i+1)·2^cellShift). Negative values clamp to cell
    * 0, values past the universe to the top cell.
    */
  def aggregator(width: Int, cellShift: Int): Aggregator[Long, Array[Long], Array[Long]] = {
    require(width >= 2, s"width must be >= 2, got $width")
    require(cellShift >= 0 && cellShift < 48, s"cellShift out of range: $cellShift")
    new Aggregator[Long, Array[Long], Array[Long]] {
      override def zero: Array[Long] = new Array[Long](width)
      override def reduce(buf: Array[Long], v: Long): Array[Long] = {
        val cell = math.min(width - 1L, math.max(0L, v >> cellShift)).toInt
        buf(cell) += 1L
        buf
      }
      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
      override def finish(r: Array[Long]): Array[Long] = r
      // ARRAY<BIGINT>-schema encoder (the GramMatrix device): the buffer
      // shuffles as a plain unsafe array and the OUTPUT is a real array
      // column callers posexplode into (cell, cnt) rows for SQL-side
      // quantile extraction
      override def bufferEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
      override def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }
  }
}
