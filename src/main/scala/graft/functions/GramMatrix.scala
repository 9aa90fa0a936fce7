package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Distributed Gram matrix (Σ xᵢ·xⱼᵀ over all vectors) — the PCA /
  * covariance / whitening preparation stage of an embedding pipeline,
  * as a typed `Aggregator`: the 100 TB shape for a d×d reduction is ONE
  * map-side-combined aggregation whose buffer is the d² accumulator
  * itself, so the shuffle carries one 32 KB buffer per partition instead
  * of n·d² exploded rows (a posexplode-pairs formulation would shuffle
  * rows quadratic in d per vector — the anti-shape).
  *
  * Exactness: elements are fixed-pointed FIRST (floor(x·S) as 64-bit),
  * then multiplied and summed in integers — sums are order-independent,
  * so the result is bit-identical at any parallelism and any engine
  * replaying floor/multiply/sum (double dot products would be
  * order-dependent under map-side combining).
  *
  * Overflow bound (documented contract, not checked per-row): with
  * |x| ≤ M the accumulator stays in range while
  * n · (M·S)² < 2⁶³ — at S=2²⁰, M=2 that is n < 2²¹ rows per *matrix*;
  * larger corpora lower S (the scale is a parameter, and relative
  * magnitudes are what PCA consumes).
  */
object GramMatrix {

  /** Upper-triangle-only Gram accumulator over full d² row-major layout
    * (lower triangle left zero — callers filter `i <= j`; the redundant
    * zeros cost 16 KB per buffer, and keeping row-major indexing makes
    * the (pos div d, pos mod d) unpack trivial in any SQL engine).
    * Slot layout: [0, d²) = Σ fᵢ·fⱼ for i ≤ j; slot d² = row count n.
    */
  def gram(dim: Int, fpScale: Long): Aggregator[Seq[Double], Array[Long], Array[Long]] =
    new Aggregator[Seq[Double], Array[Long], Array[Long]] {
      override def zero: Array[Long] = new Array[Long](dim * dim + 1)
      override def reduce(buf: Array[Long], v: Seq[Double]): Array[Long] = {
        require(v.length == dim, s"expected dim $dim, got ${v.length}")
        val f = new Array[Long](dim)
        var i = 0
        while (i < dim) { f(i) = math.floor(v(i) * fpScale).toLong; i += 1 }
        i = 0
        while (i < dim) {
          val fi = f(i)
          var j = i
          while (j < dim) { buf(i * dim + j) += fi * f(j); j += 1 }
          i += 1
        }
        buf(dim * dim) += 1L
        buf
      }
      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
      override def finish(r: Array[Long]): Array[Long] = r
      // ARRAY<BIGINT>-schema encoder (not an opaque serialized blob):
      // the buffer shuffles as a plain unsafe array and the OUTPUT is a
      // real array column callers can posexplode in SQL
      override def bufferEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
      override def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }
}
