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
    val entries = gramUpper.collect()
      .map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), BigInt(r.getLong(2)))).toMap
    def g(i: Int, j: Int): BigInt =
      entries.getOrElse((math.min(i, j), math.max(i, j)), BigInt(0))
    val s = BigInt(scale)
    var x = Array.fill(d)(s)
    for (_ <- 1 to rounds) {
      val y = Array.tabulate(d)(i => (0 until d).map(j => g(i, j) * x(j)).sum)
      val m = y.map(_.abs).max
      require(m > 0, "power iteration degenerated: G * x == 0")
      x = y.map(v => v * s / m) // BigInt / truncates toward zero (matches SQL // and Spark div)
    }
    val num = (for (i <- 0 until d; j <- 0 until d) yield x(i) * g(i, j) * x(j)).sum
    val den = x.map(v => v * v).sum
    val lambda = (num / den).toLong
    val rows = (0 until d).map(i => Row(i.toLong, x(i).toLong, lambda))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("i",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("v_fp",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("lambda_fp",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }
}
