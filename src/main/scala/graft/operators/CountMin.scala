package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min Sketch frequency counting — the mergeable fixed-size sketch
  * that turns "count every key in 100 TB" into a d×w integer grid.
  *
  * Complements the registry's other sketches (q47 HLL distinct counts,
  * q72 Misra–Gries heavy hitters): CMS answers POINT-FREQUENCY queries
  * with a one-sided error guarantee — `estimate(key) >= true_count`
  * always (a key only ever shares buckets, never loses its own
  * increments), and overshoots by more than ε·N with probability at most
  * (1/2)^d. Cormode & Muthukrishnan, "An improved data stream summary:
  * the count-min sketch and its applications" (J. Algorithms 2005).
  *
  * Scale design:
  *  - the sketch itself is `groupBy(row, bucket).count()` — map-side
  *    partial aggregation collapses every input partition to ≤ d·w rows
  *    before the shuffle, so the ONE shuffle moves a fixed-size grid no
  *    matter the corpus size (this is exactly the "mergeable summary"
  *    property: per-partition grids sum cell-wise);
  *  - estimates equi-join the probe keys' (row, bucket) coordinates
  *    against the grid — the grid side is ≤ d·w rows and broadcasts;
  *    the probe side pays one shuffle on its own key for the final min;
  *  - hashing is the registry's native polynomial hash pushed through d
  *    affine row functions ((wh·A_r + B_r) mod P) mod w — deterministic,
  *    seedless, and replayable bit-for-bit by the DuckDB oracle.
  */
object CountMin {

  /** The shared polynomial-hash modulus (TextOps.polyHash's 1e9+7). */
  val P = 1000000007L

  /** Per-row affine coefficients (A_r, B_r). Pairwise-independent enough
    * for the CMS guarantee in practice; every A_r < 2^30 so wh·A_r stays
    * far from Long overflow (wh < P ≈ 2^30).
    */
  val Coeffs: Seq[(Long, Long)] = Seq(
    (31L, 7L), (131L, 11L), (1000003L, 13L), (654435747L, 17L))

  /** Number of hash rows d. */
  def depth: Int = Coeffs.size

  /** Bucket of word-hash `wh` in row `r` of a width-`w` sketch. */
  def bucket(wh: Column, r: Int, width: Int): Column = {
    val (a, b) = Coeffs(r)
    ((wh * lit(a) + lit(b)) % lit(P)) % lit(width.toLong)
  }

  private def rowBuckets(wh: Column, width: Int): Column =
    array((0 until depth).map(r => bucket(wh, r, width)): _*)

  /** Build the sketch from a string-key column: one (row, bucket, cnt)
    * frame with at most d·w rows. The posexplode to d rows per key is
    * map-side and collapses in the partial aggregate; the shuffle carries
    * the fixed-size grid only.
    */
  def sketch(keys: DataFrame, keyCol: String, width: Int): DataFrame = {
    require(width > 0, s"sketch width must be positive, got $width")
    keys
      .select(TextOps.polyHash(col(keyCol)).as("__wh"))
      .select(posexplode(rowBuckets(col("__wh"), width)).as(Seq("r", "bkt")))
      .groupBy(col("r"), col("bkt"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for every row of `probes`: min over the d bucket
    * counts — 0 when any of the key's buckets is untouched; a never-seen
    * key whose d buckets ALL collide with seen keys returns the
    * (one-sided CMS guarantee) min of the collided counts, never an
    * underestimate. Carries every `probes` column
    * through (probe rows must be unique — duplicate probe rows collapse
    * into one output row, they do not double-count). `width` must match
    * the width the grid was built with: a mismatched width silently
    * probes the wrong buckets. The grid broadcasts; the only
    * probe-sized shuffle is the final per-key min.
    */
  def estimate(grid: DataFrame, probes: DataFrame, keyCol: String, width: Int): DataFrame = {
    require(width > 0, s"sketch width must be positive, got $width")
    val keep = probes.columns.map(col).toSeq
    probes
      .withColumn("__wh", TextOps.polyHash(col(keyCol)))
      .select(keep :+ posexplode(rowBuckets(col("__wh"), width)).as(Seq("r", "bkt")): _*)
      .join(broadcast(grid), Seq("r", "bkt"), "left")
      .groupBy(keep: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }
}
