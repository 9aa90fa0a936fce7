package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact distributed heavy-hitter detection via a Misra–Gries sketch
  * candidate pass plus an exact recount of the (tiny) candidate set.
  *
  * The 100 TB problem: "which values occur in more than a 1/(k+1)
  * fraction of rows?" computed naively is a full `groupBy(value)` —
  * a shuffle of every row keyed by a possibly-enormous value domain.
  * The two-pass shape here never shuffles the domain:
  *
  *  1. '''Candidates''' — a Misra–Gries summary with `k` counters runs
  *     as an [[Aggregator]] (map-side partial aggregation; the shuffle
  *     carries one ≤k-entry buffer per input partition, merged
  *     associatively per Agarwal et al., "Mergeable Summaries", PODS'12).
  *     MG guarantees every value with true frequency > n/(k+1) is in the
  *     summary — a SUPERSET of the heavy hitters, never a miss.
  *  2. '''Exact verify''' — recount ONLY rows matching the ≤k candidates
  *     (broadcast semi-join, so the filter runs scan-side) and keep those
  *     with `count*(k+1) > n` strictly. Sketch error cannot reach the
  *     output: the counts reported are exact, and completeness is the MG
  *     guarantee — so the result EQUALS the full-groupBy answer, which is
  *     exactly what the q72 oracle checks.
  *
  * Determinism: which BELOW-threshold values survive in the summary
  * depends on input order, but the guaranteed-present heavy hitters do
  * not, and the exact recount filters everything below the threshold —
  * so the final result is order- and partitioning-independent.
  */
object HeavyHitters {

  /** Misra–Gries buffer: parallel key/count arrays (kept ≤ k entries). */
  final case class MG(keys: Array[String], counts: Array[Long])

  /** Misra–Gries aggregator with `k` counters over a string column.
    * Guarantee: undercount ≤ n/(k+1), so every value with frequency
    * strictly above n/(k+1) survives in the final summary's keys.
    */
  def mgAggregator(k: Int): Aggregator[String, MG, MG] = {
    require(k >= 1, s"k must be >= 1, got $k")
    new Aggregator[String, MG, MG] {
      override def zero: MG = MG(Array.empty, Array.empty)

      override def reduce(b: MG, v: String): MG = {
        val i = b.keys.indexOf(v)
        if (i >= 0) { b.counts(i) += 1; b }
        else if (b.keys.length < k) MG(b.keys :+ v, b.counts :+ 1L)
        else {
          // decrement-all step: every stored counter and the incoming
          // value lose one; zeros drop out. O(k) on this path only.
          val kept = b.keys.indices.filter(j => b.counts(j) > 1L)
          MG(kept.map(b.keys).toArray, kept.map(j => b.counts(j) - 1L).toArray)
        }
      }

      /** Mergeable-summaries merge: pointwise sum, then if more than k
        * entries remain, subtract the (k+1)-th largest count from all and
        * keep the strictly-positive ones (≤ k survive). Preserves the
        * total-undercount ≤ n/(k+1) bound.
        */
      override def merge(a: MG, b: MG): MG = {
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        var j = 0
        while (j < a.keys.length) { m.update(a.keys(j), m.getOrElse(a.keys(j), 0L) + a.counts(j)); j += 1 }
        j = 0
        while (j < b.keys.length) { m.update(b.keys(j), m.getOrElse(b.keys(j), 0L) + b.counts(j)); j += 1 }
        if (m.size <= k) MG(m.keys.toArray, m.values.toArray)
        else {
          val pivot = m.values.toArray.sorted(Ordering[Long].reverse).apply(k)
          val kept = m.iterator.map { case (key, c) => (key, c - pivot) }.filter(_._2 > 0L).toArray
          MG(kept.map(_._1), kept.map(_._2))
        }
      }

      override def finish(r: MG): MG = r
      override def bufferEncoder: Encoder[MG] = Encoders.product[MG]
      override def outputEncoder: Encoder[MG] = Encoders.product[MG]
    }
  }

  /** Values of `valueCol` occurring in strictly more than 1/(k+1) of the
    * non-null rows of `df`, with their EXACT counts — `(v, cnt)` sorted
    * by `v`.
    *
    * Equals `groupBy(valueCol).count().where(cnt*(k+1) > n)` without ever
    * shuffling the full value domain: pass 1 is the MG sketch + total
    * count in ONE global aggregation (map-side buffers only), pass 2
    * recounts the ≤k candidates behind a broadcast semi-join filter at
    * the scan.
    */
  def exact(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    val mg = udaf(mgAggregator(k), Encoders.STRING)
    val vals = df.select(col(valueCol).cast("string").as("v")).where(col("v").isNotNull)
    // localCheckpoint the ONE-row summary: it feeds two branches (cands
    // and totals), and without materialization each branch would re-run
    // the global MG aggregation — a full redundant input pass. Eager,
    // lineage cut, blocks GC-freed with the result plan (the Ivf
    // pattern); the promise below stays true: one sketch pass + one
    // recount pass.
    val summary = vals
      .agg(mg(col("v")).as("mg"), count(lit(1)).as("n"))
      .withColumn("__k", lit(1))
      .localCheckpoint(true)
    val cands = summary.select(explode(col("mg.keys")).as("v"))
    val totals = summary.select(col("__k"), col("n"))
    vals
      .join(broadcast(cands), Seq("v"), "left_semi")
      .groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("__k", lit(1))
      .join(broadcast(totals), Seq("__k"))
      .where(col("cnt") * lit(k + 1L) > col("n"))
      .select(col("v"), col("cnt"))
      .orderBy(col("v"))
  }
}
