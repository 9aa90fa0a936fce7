package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VecExprs

/** SemDeDup — semantic dedup by cluster-then-compare (Abbas et al. 2023,
  * arXiv:2303.09540): coarse-cluster the embedding space, then compare
  * pairs ONLY within a cluster and keep one representative per near-dup
  * group. The published recipe for trimming web-scale corpora by
  * semantic redundancy rather than lexical overlap.
  *
  * Contrast with [[Similarity.dedupCorpus]] (q49): that one is GLOBAL —
  * LSH generates candidates across the whole corpus and every pair over
  * the threshold dies. SemDeDup deliberately scopes dedup to cluster
  * members (cross-cluster near-dups survive by design): candidate volume
  * becomes Σ|cluster|² instead of LSH bucket volume, with zero recall
  * tuning — the trade the paper makes for trivially shardable work.
  *
  * Shape at 100 TB: the quantizer is [[Ivf.centroids]] (deterministic
  * stride seeding — refine=0 here so an oracle engine can reproduce the
  * assignment exactly); assignment is one broadcast-centroid map pass +
  * one argmax agg; the intra-cluster pair join is an ids-only equi-join
  * on centroid_id (AQE splits skewed/dense clusters); vectors re-attach
  * to surviving pairs only. Keep-lowest-id policy matches every other
  * dedupCorpus in the library.
  */
object SemDedup {

  /** Survivors of per-cluster cosine dedup: corpus rows minus every row
    * that is the HIGHER id of an intra-cluster pair with cosine >=
    * `threshold`. `stride` sets cluster granularity (k = n/stride).
    *
    * `maxK` caps the quantizer at `maxK` lists (seed ids < stride*maxK),
    * forwarded to [[Ivf.centroids]] — any replay oracle MUST apply the
    * same `id % stride = 0 AND id < stride*maxK` seed predicate, or the
    * two engines define different computations once the corpus outgrows
    * the cap (q84's oracle carries it explicitly).
    */
  def dedupCorpus(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      stride: Int = 16,
      maxK: Int = 64): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val cents = Ivf.centroids(corpus, idCol, vecCol, stride, refine = 0, maxK = maxK)
    val asg = Ivf.assign(corpus, idCol, vecCol, cents, id = "__vid")
    val pairs = asg.select(col("__vid").as("id_a"), col("centroid_id"))
      .join(asg.select(col("__vid").as("id_b"), col("centroid_id")), Seq("centroid_id"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    val n = corpus.select(col(idCol).as("__vid"), col(vecCol).as("__v"),
      sqrt(VecExprs.dot(col(vecCol), col(vecCol))).as("__nrm"))
    val drop = pairs
      .join(n.select(col("__vid").as("id_a"), col("__v").as("__va"), col("__nrm").as("__na")),
        Seq("id_a"))
      .join(n.select(col("__vid").as("id_b"), col("__v").as("__vb"), col("__nrm").as("__nb")),
        Seq("id_b"))
      .where(VecExprs.dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")) >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    corpus.join(drop, Seq(idCol), "left_anti")
  }
}
