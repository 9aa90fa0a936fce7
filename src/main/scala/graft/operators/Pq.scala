package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VecExprs

/** Product quantization — the vector-COMPRESSION half of IVF-PQ (Jégou,
  * Douze & Schmid, "Product Quantization for Nearest Neighbor Search",
  * IEEE TPAMI 2011): split each d-dim vector into m subvectors, learn a
  * small codebook per subspace, and store each vector as m small codes
  * (here m bytes at k ≤ 256) instead of d floats — the 32×-plus
  * compression that lets a 100 TB embedding corpus's index live in
  * memory. Complements [[Ivf]] (the coarse quantizer / list structure);
  * composing the two is the standard IVF-PQ deployment.
  *
  * Determinism (the registry contract):
  *  - codebooks are SAMPLED, not k-means++: every `stride`-th vector by
  *    id seeds one code per subspace (no RNG; the Ivf seeding device).
  *    The fixed-point Lloyd refinement of [[Ivf.centroids]] plugs in
  *    unchanged when codebook quality matters — assignment dataflow is
  *    identical;
  *  - per-row L2 scoring is the in-order native dot product
  *    (d2 = x·x − 2·x·c + c·c), deterministic IEEE per row;
  *  - distortion AGGREGATES are fixed-point (round(d2·2^20) summed as
  *    DECIMAL(38,0)) — integer addition is order-independent where a
  *    double sum's rounding depends on partitioning.
  *
  * Scale shape: codebooks are m·k rows (broadcast); encoding is one
  * equi-join on the subspace id — every (vector, subspace) row scores k
  * codes map-side and keeps its argmin via a partial min(struct) agg, so
  * the only encode shuffle carries n·m (id, subspace, code) rows, never
  * the scored n·m·k stream.
  */
object Pq {

  private def subvectors(vecCol: Column, m: Int, dims: Int): Column = {
    val subLen = dims / m
    array((0 until m).map(i => slice(vecCol, i * subLen + 1, subLen)): _*)
  }

  /** Per-subspace codebooks from every `stride`-th vector (by id):
    * (subspace, code, __cv, __cc) with code = id div stride and
    * __cc = c·c precomputed. m must divide `dims`; vectors shorter than
    * `dims` are rejected by the slice at run time.
    */
  def codebooks(vecs: DataFrame, idCol: String, vecCol: String,
      m: Int, dims: Int, stride: Int): DataFrame = {
    require(m >= 1 && dims % m == 0, s"m must divide dims: $dims % $m != 0")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    vecs
      .where(pmod(col(idCol), lit(stride.toLong)) === 0)
      .select((col(idCol) / stride).cast("int").as("code"),
        posexplode(subvectors(col(vecCol), m, dims)).as(Seq("subspace", "__cv")))
      .select(col("subspace"), col("code"), col("__cv"),
        VecExprs.dot(col("__cv"), col("__cv")).as("__cc"))
  }

  /** Encode every vector: per (vector, subspace) the argmin-L2 code and
    * its squared distance — (id, subspace, code, dist2). Codebooks
    * broadcast; the scored n·m·k stream collapses map-side to n·m rows.
    */
  def encode(vecs: DataFrame, idCol: String, vecCol: String,
      books: DataFrame, m: Int, dims: Int): DataFrame = {
    val sub = vecs.select(col(idCol).as("__id"),
      posexplode(subvectors(col(vecCol), m, dims)).as(Seq("subspace", "__xv")))
    sub
      .join(broadcast(books), Seq("subspace"))
      .select(col("__id"), col("subspace"), col("code"),
        (VecExprs.dot(col("__xv"), col("__xv"))
          - lit(2.0) * VecExprs.dot(col("__xv"), col("__cv"))
          + col("__cc")).as("__d2"))
      .groupBy(col("__id"), col("subspace"))
      .agg(min(struct(col("__d2"), col("code"))).as("__best"))
      .select(col("__id").as("id"), col("subspace"),
        col("__best.code").as("code"), col("__best.__d2").as("dist2"))
  }
}
