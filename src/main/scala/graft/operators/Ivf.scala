package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecExprs

/** IVF-Flat approximate nearest-neighbor search — the inverted-file
  * counterpart to [[Similarity.lshBucketTopK]]'s hashing approach.
  *
  * Coarse quantizer: every `stride`-th corpus vector (by id) is a
  * centroid — deterministic "sampling" with no RNG and no iterative
  * training, so results are reproducible cluster-to-cluster (a k-means
  * refinement would drop in here; the engine shape is identical).
  *
  * Index build (one pass):
  *   - centroids are broadcast (k = n/stride rows — small by design);
  *   - each corpus vector scores all k centroids map-side (native
  *     codegen'd dot products over a broadcast nested-loop join — the
  *     n×k row stream never shuffles) and keeps its argmax via a
  *     map-side partial `max(struct(cos, centroid))` agg, so the only
  *     index shuffle carries n (vec -> centroid) assignment rows.
  *
  * Query: each probe ranks the same broadcast centroids, takes its
  * `nprobe` closest lists, and exactly re-ranks only the vectors
  * assigned to those lists — reading ~nprobe/k of the corpus instead of
  * all of it. Recall < 1 by construction (a true neighbor can live in an
  * unprobed list); raise `nprobe` to trade cost for recall.
  *
  * 100 TB notes: at scale the assignment table is the persisted index —
  * partition/bucket it BY centroid so a query's candidate fetch is a
  * partition-pruned scan, not a join of the whole corpus. Skewed lists
  * (dense regions) are the classic IVF imbalance; AQE splits the
  * candidate equi-join, and a k-means quantizer (balanced lists) is the
  * production refinement.
  */
object Ivf {

  private def cos(v1: Column, n1: Column, v2: Column, n2: Column): Column =
    VecExprs.dot(v1, v2) / (n1 * n2)

  private def withNorm(df: DataFrame, idCol: String, vecCol: String,
      id: String, vec: String, nrm: String): DataFrame =
    df.select(col(idCol).as(id), col(vecCol).as(vec),
      sqrt(VecExprs.dot(col(vecCol), col(vecCol))).as(nrm))

  /** Deterministic coarse centroids: corpus vectors whose id ≡ 0 mod
    * `stride`. Returns (centroid_id, __kv, __kn).
    */
  def centroids(corpus: DataFrame, idCol: String, vecCol: String, stride: Int): DataFrame =
    withNorm(corpus.where(pmod(col(idCol), lit(stride)) === 0), idCol, vecCol,
      "centroid_id", "__kv", "__kn")

  /** Inverted-file assignment: (id, centroid_id) — each vector's argmax-
    * cosine centroid, larger centroid_id winning exact ties (total order,
    * deterministic).
    */
  def assign(corpus: DataFrame, idCol: String, vecCol: String, cents: DataFrame,
      id: String = "neighbor_id"): DataFrame = {
    val v = withNorm(corpus, idCol, vecCol, id, "__v", "__n")
    v.join(broadcast(cents))
      .select(col(id), col("centroid_id"),
        cos(col("__v"), col("__n"), col("__kv"), col("__kn")).as("__cos"))
      .groupBy(col(id))
      .agg(max(struct(col("__cos"), col("centroid_id"))).as("__best"))
      .select(col(id), col("__best.centroid_id").as("centroid_id"))
  }

  /** Approximate top-k cosine neighbors per probe, IVF-style. Same output
    * schema as [[Similarity.bruteTopK]]/[[Similarity.lshBucketTopK]]:
    * (probe_id, neighbor_id, cosine, rank).
    */
  def topK(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      stride: Int = 16,
      nprobe: Int = 4): DataFrame = {
    require(stride >= 1 && nprobe >= 1, s"bad stride=$stride nprobe=$nprobe")
    val cents = centroids(corpus, idCol, vecCol, stride)
    val index = assign(corpus, idCol, vecCol, cents)

    // per-probe nprobe closest centroid lists (probes × k is tiny)
    val p = withNorm(probes, idCol, vecCol, "probe_id", "__pv", "__pn")
    val cw = Window.partitionBy(col("probe_id"))
      .orderBy(col("__ccos").desc, col("centroid_id").asc)
    val probeLists = p.join(broadcast(cents))
      .select(col("probe_id"), col("centroid_id"),
        cos(col("__pv"), col("__pn"), col("__kv"), col("__kn")).as("__ccos"))
      .withColumn("__cr", row_number().over(cw))
      .where(col("__cr") <= nprobe)
      .select(col("probe_id"), col("centroid_id"))

    // candidates: vectors in the probed lists — ids only through the join
    val cands = probeLists.join(index, Seq("centroid_id"))
      .where(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"))

    // exact re-rank of candidates (corpus vectors re-attach by equi-join,
    // probe vectors broadcast — same shape as lshBucketTopK)
    val cv = withNorm(corpus, idCol, vecCol, "neighbor_id", "__cv", "__cn")
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    cands
      .join(cv, Seq("neighbor_id"))
      .join(broadcast(p), Seq("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        cos(col("__pv"), col("__pn"), col("__cv"), col("__cn")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
