package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Top principal direction of a fixed-point Gram matrix by power
  * iteration — the eigen step of embedding PCA/whitening, downstream of
  * [[graft.functions.GramMatrix]]'s distributed d×d reduction.
  *
  * Execution split is the MLlib precedent
  * (`RowMatrix.computePrincipalComponents` collects the Gram to the
  * driver and runs a LOCAL eig): the corpus-sized work is the ONE
  * map-side-combined Gram aggregation; its d² output is a model-sized
  * summary (64×64 = 32 KB here), and iterating on it is driver
  * arithmetic — the same bounded-collect contract as Bpe's argmax and
  * Ivf's centroid list. Distributing a 64×64 matvec would be pure
  * overhead.
  *
  * Exactness: everything is BigInteger — the matvec products, the
  * max-|y| renormalization (truncating division, which DuckDB's `//`
  * and Spark's `div` both match), and the final Rayleigh quotient — so
  * an oracle replaying the same recurrence in HUGEINT reproduces every
  * bit, and parallelism can't perturb anything (there is nothing left
  * distributed to perturb).
  */
object PowerIteration {

  /** `rounds` power-iteration steps from the all-ones(·scale) vector:
    * y = G·x, then renormalize so max|component| = scale (truncating
    * division toward zero — BigInt `/`, SQL `//`, Spark `div` agree).
    */
  private def iterate(g: (Int, Int) => BigInt, d: Int, rounds: Int,
      s: BigInt): Array[BigInt] = {
    var x = Array.fill(d)(s)
    for (_ <- 1 to rounds) {
      val y = Array.tabulate(d)(i => (0 until d).map(j => g(i, j) * x(j)).sum)
      val m = y.map(_.abs).max
      require(m > 0, "power iteration degenerated: G * x == 0")
      x = y.map(v => v * s / m)
    }
    x
  }

  /** Rayleigh quotient xᵀGx div xᵀx (truncating), in G's own units. */
  private def rayleigh(g: (Int, Int) => BigInt, d: Int,
      x: Array[BigInt]): BigInt = {
    val num = (for (i <- 0 until d; j <- 0 until d) yield x(i) * g(i, j) * x(j)).sum
    val den = x.map(v => v * v).sum
    num / den
  }

  private def entryLookup(gramUpper: DataFrame): (Int, Int) => BigInt = {
    val entries = gramUpper.collect()
      .map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), BigInt(r.getLong(2)))).toMap
    (i, j) => entries.getOrElse((math.min(i, j), math.max(i, j)), BigInt(0))
  }

  private def frame(spark: SparkSession, rows: Seq[Row],
      names: Seq[String]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(names.map(n =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.LongType, nullable = false))))

  /** (i, v_fp, lambda_fp) for the top eigenpair of the symmetric
    * matrix given as UPPER-TRIANGLE rows (i, j, gram_fp), i ≤ j. The
    * eigenvector is fixed-point at `scale` (max-abs component =
    * ±scale); lambda_fp is the Rayleigh quotient xᵀGx div xᵀx in the
    * matrix's own units. Starts from the all-ones vector; `rounds`
    * truncating-division iterations, deterministic end-to-end.
    */
  def topEigen(spark: SparkSession, gramUpper: DataFrame, d: Int,
      rounds: Int, scale: Long = 1L << 20): DataFrame = {
    require(d >= 1 && rounds >= 1, s"need d >= 1 and rounds >= 1, got d=$d rounds=$rounds")
    val g = entryLookup(gramUpper)
    val s = BigInt(scale)
    val x = iterate(g, d, rounds, s)
    val lambda = rayleigh(g, d, x).toLong
    frame(spark, (0 until d).map(i => Row(i.toLong, x(i).toLong, lambda)),
      Seq("i", "v_fp", "lambda_fp"))
  }

  /** Top TWO eigenpairs by Hotelling deflation: after the first
    * direction x₁ converges, iterate again on
    *
    *   G₂[i,j] = G[i,j] − (λ₁ · x₁ᵢ · x₁ⱼ) div (x₁ᵀx₁)
    *
    * — the rank-one removal of the found component, per-entry truncating
    * division so G₂ stays integer at G's own magnitude and any engine
    * replays it bit-exact. The second iteration then converges to the
    * dominant direction of the REMAINDER, i.e. the second principal
    * component (exact-arithmetic Hotelling deflation; the truncation
    * residue perturbs G₂ by <1 ulp per entry, and the output is DEFINED
    * as this integer recurrence, so cross-engine equality is exact even
    * where the float-world eigenvector would differ in the last bits).
    *
    * Output: (i, v1_fp, v2_fp, lambda1_fp, lambda2_fp) — lambda2 is the
    * Rayleigh quotient on G₂ (the variance along x₂ with x₁'s mass
    * removed, which is exactly the "explained variance of PC2" figure).
    */
  def topTwoEigen(spark: SparkSession, gramUpper: DataFrame, d: Int,
      rounds: Int, scale: Long = 1L << 20): DataFrame = {
    require(d >= 1 && rounds >= 1, s"need d >= 1 and rounds >= 1, got d=$d rounds=$rounds")
    val g = entryLookup(gramUpper)
    val s = BigInt(scale)
    val x1 = iterate(g, d, rounds, s)
    val l1 = rayleigh(g, d, x1)
    val vv = x1.map(v => v * v).sum
    def g2(i: Int, j: Int): BigInt = g(i, j) - (l1 * x1(i) * x1(j)) / vv
    val x2 = iterate(g2, d, rounds, s)
    val l2 = rayleigh(g2, d, x2)
    frame(spark,
      (0 until d).map(i =>
        Row(i.toLong, x1(i).toLong, x2(i).toLong, l1.toLong, l2.toLong)),
      Seq("i", "v1_fp", "v2_fp", "lambda1_fp", "lambda2_fp"))
  }
}
