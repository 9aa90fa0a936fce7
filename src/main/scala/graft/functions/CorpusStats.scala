package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §7.6): corpus token-count moments.
  *
  * A custom `Aggregator[IN, BUF, OUT]` — the engine's example of the
  * public typed-aggregation extension point (no Catalyst internals).
  * Aggregates exact integer moments (n, Σx, Σx²) of a per-document token
  * count; mean/variance derive from the exact sums in one deterministic
  * double expression each, so a SQL oracle reproduces them bit-for-bit.
  *
  * Scale: the buffer is three longs; merge is associative/commutative —
  * partial aggregation happens map-side and the shuffle carries one
  * buffer per group per partition, the same contract as a builtin agg.
  */
object CorpusStats {

  case class Moments(n: Long, sum: Long, sumSq: Long)

  val tokenMoments: Aggregator[Long, Moments, Moments] =
    new Aggregator[Long, Moments, Moments] {
      override def zero: Moments = Moments(0L, 0L, 0L)
      override def reduce(b: Moments, x: Long): Moments =
        Moments(b.n + 1, b.sum + x, b.sumSq + x * x)
      override def merge(a: Moments, b: Moments): Moments =
        Moments(a.n + b.n, a.sum + b.sum, a.sumSq + b.sumSq)
      override def finish(r: Moments): Moments = r
      override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
      override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
    }
}
