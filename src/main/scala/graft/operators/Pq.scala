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

  /** Asymmetric-distance top-k (the PQ SEARCH side): each probe
    * precomputes its m×k distance TABLE to the codebooks (round(d2·2^20)
    * as integers — the fixed-point device that makes the m-term sum
    * order-independent), the encoded corpus is ranked by the sum of m
    * table lookups — m integer adds per candidate instead of a d-dim
    * dot product against raw floats that are no longer stored.
    * Returns (probe_id, rank, neighbor_id, adist_fp), ranks 1..k,
    * deterministic tiebreak on neighbor id. `enc` is [[encode]]'s
    * output (the 8-byte-per-vector index — at corpus scale this is THE
    * stored artifact; raw vectors are gone).
    *
    * Scale shape: probe tables are |probes|·m·k rows (broadcast); the
    * lookup join is equi on (subspace, code); the only corpus-sized
    * shuffle carries (probe, id) partial sums, group-limited to k per
    * probe before the final order.
    */
  /** Per-probe m×k FIXED-POINT distance table to the codebooks:
    * (__pid, subspace, code, __dfp) with __dfp = round(d2·2^20) — the
    * integer form that makes the m-term candidate sum
    * order-independent. |probes|·m·k rows, built map-side against the
    * broadcast codebooks.
    */
  def distanceTable(probes: DataFrame, idCol: String, vecCol: String,
      books: DataFrame, m: Int, dims: Int): DataFrame =
    probes
      .select(col(idCol).as("__pid"),
        posexplode(subvectors(col(vecCol), m, dims)).as(Seq("subspace", "__xv")))
      .join(broadcast(books), Seq("subspace"))
      .select(col("__pid"), col("subspace"), col("code"),
        round((VecExprs.dot(col("__xv"), col("__xv"))
          - lit(2.0) * VecExprs.dot(col("__xv"), col("__cv"))
          + col("__cc")) * lit(1048576.0)).cast("long").as("__dfp"))

  def searchTopK(enc: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
      books: DataFrame, m: Int, dims: Int, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val table = distanceTable(probes, idCol, vecCol, books, m, dims)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("adist_fp").asc, col("neighbor_id").asc)
    enc
      .join(broadcast(table), Seq("subspace", "code"))
      // a probe is not its own neighbor (bruteTopK's contract)
      .where(col("__pid") =!= col("id"))
      .groupBy(col("__pid").as("probe_id"), col("id").as("neighbor_id"))
      .agg(sum(col("__dfp")).as("adist_fp"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"), col("adist_fp"))
  }
}
