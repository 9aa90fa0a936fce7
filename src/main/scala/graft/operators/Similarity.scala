package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Two tiers, the standard ANN architecture:
  *  - [[bruteTopK]] / [[cosinePairs]]: exact brute force — the baseline
  *    and the within-bucket re-ranker. Probe side is broadcast (probes
  *    are few); the corpus is scanned once, map-side, and only k rows
  *    per probe survive the per-probe top-k. No all-pairs shuffle.
  *  - [[lshBucketTopK]]: random-hyperplane LSH — the 100 TB path. Each
  *    vector gets a small set of bucket keys (sign-pattern of `planes`
  *    dot products, `tables` independent tables); candidates are
  *    bucket-joined then exactly re-ranked. Shuffle volume is
  *    O(n·tables), never O(n²); recall is tunable via tables/planes.
  *
  * Determinism: dot products fold the element products in array order
  * (left fold), so the result is a fixed IEEE evaluation order both for
  * reproducibility across runs and bit-equality with an oracle engine
  * that sums in the same order.
  */
object Similarity {

  /** In-order dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** L2 norm (in-order). */
  def norm(a: Column): Column = sqrt(aggregate(transform(a, x => x * x), lit(0.0d), _ + _))

  /** Cosine similarity of two double arrays: dot/(|a|*|b|). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Spread a small single-file scan across the cluster before a
    * compute-heavy map stage. A few-MB parquet file arrives as ONE split,
    * so per-row-expensive expressions (higher-order folds over arrays)
    * would run on one core; hash-repartitioning by `key` is deterministic
    * and costs one tiny shuffle. At 100 TB inputs arrive pre-split and
    * this becomes a no-op choice, but heavy decode/hash stages still
    * routinely want *more* partitions than the scan produced.
    */
  private[operators] def spread(df: DataFrame, key: String): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(key))

  /** Exact top-k cosine neighbors per probe.
    * `corpus`/`probes`: (id, vec Array[Double]). Probes are broadcast —
    * the corpus never shuffles until the per-probe top-k, which carries
    * only corpus_rows × n_probes scored ids, and the window's
    * rank-filter is group-limited before the final shuffle.
    * Norms are computed once per row before the join (not per pair):
    * cosine = dot/(nrm_a*nrm_b), the same op order as the oracle.
    */
  def bruteTopK(corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = spread(corpus, idCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"), norm(col(vecCol)).as("__cn"))
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("__pv"), norm(col(vecCol)).as("__pn"))
    val scored = c.join(broadcast(p), col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        (dot(col("__pv"), col("__cv")) / (col("__pn") * col("__cn"))).as("cosine"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** All pairs (idA < idB) with cosine >= threshold — exact, O(n²/2)
    * comparisons. Correct at test scale; at 100 TB use [[lshBucketTopK]]
    * buckets as the candidate generator instead of the cross join.
    * Norms are per-row, the dot per pair, the division once (named
    * column reused by the filter).
    */
  def cosinePairs(vecs: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val n = spread(vecs, idCol)
      .select(col(idCol).as("__id"), col(vecCol).as("__v"), norm(col(vecCol)).as("__n"))
    val a = n.select(col("__id").as("id_a"), col("__v").as("__va"), col("__n").as("__na"))
    val b = n.select(col("__id").as("id_b"), col("__v").as("__vb"), col("__n").as("__nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("__va"), col("__vb")) / (col("__na") * col("__nb"))).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Deterministic random hyperplanes: `tables` × `planes` × dim doubles
    * from the fixed LCG stream (no JVM RNG — fully specified here).
    */
  def hyperplanes(tables: Int, planes: Int, dim: Int, seed: Long): Seq[Seq[Seq[Double]]] = {
    var s = seed
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      // top 53 bits -> uniform in [-1, 1)
      ((s >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    Seq.fill(tables)(Seq.fill(planes)(Seq.fill(dim)(next())))
  }

  /** LSH bucket keys for a vector: one sign-pattern int per table.
    * Fails fast when the vector length differs from `dim` — zip_with
    * would otherwise null-pad, every sign test would fall to its
    * default, and all vectors would silently share one bucket (turning
    * the bucketed join into a full cross join with correct-looking
    * results).
    */
  def bucketKeys(vec: Column, tables: Int, planes: Int, dim: Int, seed: Long): Column = {
    val hp = hyperplanes(tables, planes, dim, seed)
    val keys = array(hp.zipWithIndex.map { case (tbl, t) =>
      val sig = tbl.zipWithIndex.map { case (plane, p) =>
        val planeArr = array(plane.map(lit): _*)
        when(dot(vec, planeArr) >= 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
      struct(lit(t).as("table"), sig.as("sig"))
    }: _*)
    when(size(vec) === dim, keys)
      .otherwise(raise_error(concat(
        lit(s"lshBucketTopK: vector length "), size(vec).cast("string"),
        lit(s" != configured dim $dim"))))
  }

  /** Approximate top-k: candidates = vectors sharing any LSH bucket with
    * the probe, exactly re-ranked within the candidate set. Returns the
    * same schema as [[bruteTopK]]. Recall < 1 by construction; raise
    * `tables` (more candidates, higher recall) or lower `planes` (bigger
    * buckets) to trade cost for recall.
    */
  def lshBucketTopK(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      tables: Int = 8,
      planes: Int = 8,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    // norms computed once per row (same rule as bruteTopK) — a probe in
    // many buckets must not re-fold its norm per candidate pair
    def keyed(df: DataFrame, id: String, vec: String, nrm: String) =
      df.select(col(idCol).as(id), col(vecCol).as(vec), norm(col(vecCol)).as(nrm),
          explode(bucketKeys(col(vecCol), tables, planes, dim, seed)).as("__b"))
        .select(col(id), col(vec), col(nrm), col("__b.table").as("table"), col("__b.sig").as("sig"))
    val c = keyed(spread(corpus, idCol), "neighbor_id", "__cv", "__cn")
    val p = keyed(probes, "probe_id", "__pv", "__pn")
    val cands = c.join(broadcast(p), Seq("table", "sig"))
      .where(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"), col("__pv"), col("__cv"), col("__pn"), col("__cn"))
      .distinct()
    val scored = cands.select(col("probe_id"), col("neighbor_id"),
      (dot(col("__pv"), col("__cv")) / (col("__pn") * col("__cn"))).as("cosine"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
