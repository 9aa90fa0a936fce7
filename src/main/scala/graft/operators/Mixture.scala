package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic data-mixture resampling — the stage that reshapes a raw
  * corpus's source/language distribution into the training mixture
  * (upsample-free: rates are capped at 1, so this only *downsamples*
  * over-represented keys toward the target shares; cf. the DSIR
  * importance scorer in [[graft.PipelineQueries]] q86 which reweights by
  * content rather than by group).
  *
  * Rate-based, not exact-N: at corpus scale "keep exactly N per key"
  * needs a global per-key ordering (a full sort or a group-limited
  * window, q53's shape); a per-row hash-threshold keep decision is
  * embarrassingly parallel, one scan, and lands within binomial noise of
  * the target — the standard trade at 100 TB. Exact-N remains available
  * via q53/q77's window device when N is small.
  *
  * Determinism: the keep decision hashes the ROW ID (q53's
  * Knuth-multiplier device — engine-independent integer arithmetic), not
  * `rand()`: re-runs, retries, and different cluster layouts select the
  * identical sample, and an oracle engine reproduces it bit-for-bit.
  */
object Mixture {

  /** Deterministic per-row priority in [0, 1e6): Knuth multiplicative
    * hash of the id mod a large prime, folded to ppm — uniform enough
    * for rate sampling, and exactly reproducible in any engine with
    * 64-bit integer arithmetic ((id * 2654435761) % 1000000007 % 1e6).
    */
  def priorityPpm(id: Column): Column =
    pmod(pmod(id * lit(2654435761L), lit(1000000007L)), lit(1000000L))

  /** Per-key keep rates (ppm) for a target mixture: key `k` gets
    * `sharesPpm(k)` of a `budgetDocs`-sized output, so
    * rate = min(1e6, sharePpm·budget div n_k). Keys absent from
    * `sharesPpm` get share 0 (dropped). Returns
    * (keyCol, n_docs, rate_ppm) — key-cardinality rows, broadcastable at
    * any corpus scale.
    */
  def ratesPpm(
      df: DataFrame, keyCol: String,
      sharesPpm: Seq[(String, Long)], budgetDocs: Long): DataFrame = {
    require(sharesPpm.nonEmpty, "need at least one target share")
    require(budgetDocs > 0, s"budgetDocs must be positive, got $budgetDocs")
    val spark = df.sparkSession
    import spark.implicits._
    val shares = sharesPpm.toDF(keyCol, "__share_ppm")
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_docs"))
      .join(broadcast(shares), Seq(keyCol))
      .withColumn("rate_ppm",
        least(lit(1000000L),
          expr(s"(CAST(__share_ppm AS DECIMAL(38,0)) * ${budgetDocs}L) div n_docs")))
      .drop("__share_ppm")
  }

  /** Resample `df` toward the target mixture: keep a row iff its id
    * priority falls under its key's rate. One count aggregation
    * (key-cardinality result, broadcast back), one map-side filter — no
    * global sort, no second scan.
    */
  def sample(
      df: DataFrame, keyCol: String, idCol: String,
      sharesPpm: Seq[(String, Long)], budgetDocs: Long): DataFrame = {
    val rates = ratesPpm(df, keyCol, sharesPpm, budgetDocs)
      .select(col(keyCol), col("rate_ppm"))
    df.join(broadcast(rates), Seq(keyCol))
      .where(priorityPpm(col(idCol)) < col("rate_ppm"))
  }

  /** Temperature-scaled keep rates with α = 1/2: shares derived from the
    * DATA (share_k ∝ √n_k) instead of a hand-specified target — the
    * multilingual-training practice (mT5/XLM-R's exponential smoothing)
    * that upweights scarce keys without letting the head dominate.
    *
    * Exactness: the weight is floor(√(n_k·10^10)) — IEEE sqrt of an
    * exactly-representable integer (n_k·10^10 < 2^53 for n_k up to
    * ~9·10^5 per key; larger corpora should drop the scale factor),
    * floored, so any engine reproduces it bit-for-bit. The normalizer
    * Σ weight is a window over the KEY-CARDINALITY frame partitioned by
    * a constant — the frame is |keys| rows at any corpus scale, so the
    * single partition holds a config-sized enum, never data.
    * rate = min(1e6 ppm, weight·budget·10^6 div (Σweight·n_k)).
    *
    * Overflow: the numerator weight·10^6·budget reaches ~10^14·budget
    * (weight tops out near 9.5·10^7 at the documented n_k cap), which
    * wraps a non-ANSI Long once budgetDocs exceeds ~10^5 — so both
    * products are computed in DECIMAL(38,0) and only the integral
    * quotient (≤ budget·10^6 by weight ≤ Σweight) lands back in a Long.
    * That bounds budgetDocs at ~9.2·10^12 before the QUOTIENT itself
    * could exceed Long, which the require guards.
    */
  def temperatureRatesPpm(df: DataFrame, keyCol: String, budgetDocs: Long): DataFrame = {
    require(budgetDocs > 0, s"budgetDocs must be positive, got $budgetDocs")
    require(budgetDocs <= 9000000000000L,
      s"budgetDocs above 9e12 overflows the ppm quotient, got $budgetDocs")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_docs"))
      .withColumn("weight", floor(sqrt(col("n_docs").cast("double") * lit(1.0e10))).cast("long"))
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(pmod(col("n_docs"), lit(1L)))
    counts
      .withColumn("__tot", sum(col("weight")).over(tot))
      .withColumn("rate_ppm",
        least(lit(1000000L),
          expr(s"(CAST(weight AS DECIMAL(38,0)) * 1000000 * ${budgetDocs}L)" +
            s" div (CAST(__tot AS DECIMAL(38,0)) * n_docs)")))
      .drop("__tot")
  }
}
