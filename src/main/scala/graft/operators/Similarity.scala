package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecExprs

/** Similarity search over embedding columns (Array[Float]).
  *
  * Two tiers, the standard ANN architecture:
  *  - [[bruteTopK]] / [[cosinePairsExact]]: exact brute force — the
  *    baseline and the within-bucket re-ranker. Probe side is broadcast
  *    (probes are few); the corpus is scanned once, map-side, and only k
  *    rows per probe survive the per-probe top-k. The all-pairs form is
  *    an explicit small-data escape hatch.
  *  - [[lshBucketTopK]] / [[cosinePairsLsh]]: random-hyperplane LSH — the
  *    100 TB path. Each vector gets one sign-pattern signature per table
  *    (native [[graft.functions.LshSignatures]], all tables in one tight
  *    loop); candidates are bucket-equi-joined carrying IDS ONLY, then
  *    exactly re-scored after re-attaching vectors. Shuffle volume is
  *    O(n·tables) id rows, never O(n²) and never wide arrays through the
  *    bucket join.
  *
  * Candidate-volume honesty: hyperplane LSH separates when the target
  * cosine is far above the corpus background. At a production near-dup
  * threshold (>= 0.8: collision prob per bit 0.795 vs background 0.5)
  * buckets prune candidates by orders of magnitude. At a threshold inside
  * the background tail (e.g. 0.4 on isotropic vectors: 0.63 vs 0.5 per
  * bit) no parameterization prunes much — measured 42% of all pairs
  * survive as candidates on the test corpus at tables=128, planes=8 —
  * but the *shape* stays the scale-safe one: equi-join, bounded buckets,
  * AQE-splittable skew, no nested-loop.
  *
  * Determinism: dot products fold the element products in array order
  * (sequential left fold, native expression), so the result is a fixed
  * IEEE evaluation order both for reproducibility across runs and
  * bit-equality with an oracle engine that sums in the same order.
  */
object Similarity {

  /** In-order dot product of two double arrays (native, codegen'd). */
  def dot(a: Column, b: Column): Column = VecExprs.dot(a, b)

  /** L2 norm: sqrt of the in-order self-dot — the same multiply/add
    * sequence as the `transform`+`aggregate` fold it replaces, so norms
    * are bit-identical to the oracle's.
    */
  def norm(a: Column): Column = sqrt(VecExprs.dot(a, a))

  /** Cosine similarity of two double arrays: dot/(|a|*|b|). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Spread a small single-file scan across the cluster before a
    * compute-heavy map stage. A few-MB parquet file arrives as ONE split,
    * so per-row-expensive expressions (hash loops, signature folds) would
    * run on one core; hash-repartitioning by `key` is deterministic and
    * costs one tiny shuffle. At 100 TB inputs arrive pre-split and this
    * becomes a no-op choice, but heavy decode/hash stages still routinely
    * want *more* partitions than the scan produced.
    */
  private[operators] def spread(df: DataFrame, key: String): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(key))

  /** (id, vec, norm) projection, norms computed once per row — never per
    * candidate pair. Zero-norm vectors are DROPPED (same contract as
    * Ivf.withNorm): cosine is undefined on them, and under ANSI mode the
    * zero divisor throws DIVIDE_BY_ZERO rather than degrading to NaN —
    * they never enter pair/top-k results and survive dedup trivially.
    */
  private def withNorm(df: DataFrame, idCol: String, vecCol: String,
      id: String, vec: String, nrm: String): DataFrame =
    df.select(col(idCol).as(id), col(vecCol).as(vec), norm(col(vecCol)).as(nrm))
      .where(col(nrm) > 0)

  /** (id, table, sig) LSH bucket rows — ids only, one row per table; the
    * vector is dropped before the explode so the bucket join shuffles
    * nothing wide.
    */
  private def banded(df: DataFrame, idCol: String, vecCol: String, id: String,
      tables: Int, planes: Int, dim: Int, seed: Long): DataFrame =
    df.select(
      col(idCol).as(id),
      posexplode(VecExprs.lshSignatures(col(vecCol), tables, planes, dim, seed))
        .as(Seq("table", "sig")))

  /** Exact top-k cosine neighbors per probe.
    * `corpus`/`probes`: (id, vec Array[Double]). Probes are broadcast —
    * the corpus never shuffles until the per-probe top-k, which carries
    * only corpus_rows × n_probes scored ids, and the window's
    * rank-filter is group-limited before the final shuffle.
    */
  def bruteTopK(corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = withNorm(spread(corpus, idCol), idCol, vecCol, "neighbor_id", "__cv", "__cn")
    val p = withNorm(probes, idCol, vecCol, "probe_id", "__pv", "__pn")
    val scored = c.join(broadcast(p), col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        (dot(col("__pv"), col("__cv")) / (col("__pn") * col("__cn"))).as("cosine"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** All pairs (idA < idB) with cosine >= threshold — exact, O(n²/2)
    * comparisons through a nested-loop join. EXPLICIT SMALL-DATA ESCAPE
    * HATCH: use [[cosinePairsLsh]] everywhere the corpus can grow; this
    * form exists for oracle construction and sub-100k-row corpora where
    * the quadratic scan is cheaper than any candidate machinery.
    */
  def cosinePairsExact(vecs: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val n = withNorm(spread(vecs, idCol), idCol, vecCol, "__id", "__v", "__n")
    val a = n.select(col("__id").as("id_a"), col("__v").as("__va"), col("__n").as("__na"))
    val b = n.select(col("__id").as("id_b"), col("__v").as("__vb"), col("__n").as("__nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("__va"), col("__vb")) / (col("__na") * col("__nb"))).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** All pairs (idA < idB) with cosine >= threshold via LSH candidate
    * generation — the scale form of [[cosinePairsExact]]:
    *
    *   1. band: one signature per table per vector, native expression,
    *      map-side; ids only from here on;
    *   2. bucket self-join on (table, sig) — the ONLY O(candidates)
    *      stage, an equi-join AQE can split on skew;
    *   3. distinct (id_a, id_b) — deduped BEFORE vectors re-attach, so
    *      the wide arrays never ride the candidate explosion;
    *   4. exact re-score of candidates, filter >= threshold.
    *
    * Every emitted pair is exactly verified, so precision is 1; recall is
    * the probability a true pair shares >= 1 bucket — tune tables/planes
    * to the threshold (defaults verified to find ALL pairs at threshold
    * 0.4 on the sf0.01 test corpus; see the class doc for the honest
    * candidate-volume tradeoff at low thresholds).
    */
  def cosinePairsLsh(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      tables: Int = 128,
      planes: Int = 8,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val b = banded(spread(vecs, idCol), idCol, vecCol, "__id", tables, planes, dim, seed)
    val cands = b.select(col("__id").as("id_a"), col("table"), col("sig"))
      .join(b.select(col("__id").as("id_b"), col("table"), col("sig")), Seq("table", "sig"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val vn = withNorm(spread(vecs, idCol), idCol, vecCol, "__vid", "__v", "__n")
    cands
      .join(vn.select(col("__vid").as("id_a"), col("__v").as("__va"), col("__n").as("__na")), Seq("id_a"))
      .join(vn.select(col("__vid").as("id_b"), col("__v").as("__vb"), col("__n").as("__nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("__va"), col("__vb")) / (col("__na") * col("__nb"))).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Corpus-level embedding dedup: drop every vector that is the higher
    * id of a [[cosinePairsLsh]] pair (greedy keep-lowest-id — the same
    * policy as [[MinHash.dedupCorpus]], over cosine instead of Jaccard).
    * Survivors = vecs ANTI JOIN distinct id_b: one id shuffle, vectors
    * never ride the pair pipeline.
    */
  def dedupCorpus(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      tables: Int = 128,
      planes: Int = 8,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val drop = cosinePairsLsh(vecs, idCol, vecCol, threshold, tables, planes, dim, seed)
      .select(col("id_b").as(idCol)).distinct()
    vecs.join(drop, Seq(idCol), "left_anti")
  }

  /** Approximate top-k: candidates = vectors sharing any LSH bucket with
    * the probe, exactly re-ranked within the candidate set. Returns the
    * same schema as [[bruteTopK]]. Recall < 1 by construction; raise
    * `tables` (more candidates, higher recall) or lower `planes` (bigger
    * buckets) to trade cost for recall.
    *
    * Shape: the bucket join carries ids only; candidate (probe, neighbor)
    * pairs are DISTINCT'd before vectors re-attach (corpus vectors via
    * one equi-join on neighbor_id, probe vectors broadcast) — the wide
    * arrays never multiply through bucket collisions.
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
    val c = banded(spread(corpus, idCol), idCol, vecCol, "neighbor_id", tables, planes, dim, seed)
    val p = banded(probes, idCol, vecCol, "probe_id", tables, planes, dim, seed)
    val cands = c.join(broadcast(p), Seq("table", "sig"))
      .where(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"))
      .distinct()
    val cv = withNorm(spread(corpus, idCol), idCol, vecCol, "neighbor_id", "__cv", "__cn")
    val pv = withNorm(probes, idCol, vecCol, "probe_id", "__pv", "__pn")
    val scored = cands
      .join(cv, Seq("neighbor_id"))
      .join(broadcast(pv), Seq("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        (dot(col("__pv"), col("__cv")) / (col("__pn") * col("__cn"))).as("cosine"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Majority-vote label assignment from a precomputed neighbor list —
    * the composable half of k-NN classification. `neighbors` is any
    * (probe_id, neighbor_id) frame ([[bruteTopK]], [[lshBucketTopK]] or
    * [[Ivf.topK]] output all fit), `labels` maps `idCol` -> `labelCol`.
    * Ties break to the smallest label (deterministic). Returns
    * (probe_id, pred_label, votes).
    *
    * Shape: one equi-join to attach labels (label table is id->label,
    * orders of magnitude narrower than the vectors), one (probe, label)
    * aggregation, one probe-partitioned top-1 window — all hash-keyed,
    * nothing quadratic beyond the neighbor list itself.
    */
  def classifyFromNeighbors(
      neighbors: DataFrame, labels: DataFrame, idCol: String, labelCol: String): DataFrame = {
    val votes = neighbors
      .join(labels.select(col(idCol).as("neighbor_id"), col(labelCol).as("pred_label")),
        Seq("neighbor_id"))
      .groupBy(col("probe_id"), col("pred_label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("votes").desc, col("pred_label").asc)
    votes.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(col("probe_id"), col("pred_label"), col("votes"))
  }

  /** k-NN label propagation: classify each probe by the majority label of
    * its k exact nearest corpus neighbors (cosine) — the weak-labeling /
    * auto-annotation stage of a training-data pipeline. `corpus` carries
    * (idCol, vecCol, labelCol); swap the [[bruteTopK]] candidate stage for
    * [[lshBucketTopK]]/[[Ivf.topK]] + [[classifyFromNeighbors]] when the
    * corpus outgrows the brute scan.
    */
  def classifyKnn(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame =
    classifyFromNeighbors(bruteTopK(corpus, probes, idCol, vecCol, k), corpus, idCol, labelCol)

  /** Contrastive pair mining: for each probe (anchor), the k nearest
    * SAME-label neighbors (positives) and the k nearest DIFFERENT-label
    * neighbors (hard negatives) — the training-pair construction stage
    * for contrastive/metric learning, where hard negatives (wrong-label
    * vectors that look most like the anchor) carry most of the gradient
    * signal.
    *
    * Returns (probe_id, kind 'pos'|'neg', neighbor_id, cosine,
    * rank LONG). ONE window over (probe, same-label?) partitions does
    * both sides — no union of two scans, no second pass; the rank filter
    * compiles to WindowGroupLimit so map tasks keep k rows per
    * (probe, side) before the shuffle. Probe side is broadcast (the
    * [[bruteTopK]] contract — probes are few); swap the scored frame for
    * an LSH/IVF candidate set when the corpus outgrows one scan.
    */
  def contrastivePairs(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int = 1): DataFrame = {
    val c = spread(corpus, idCol).select(
        col(idCol).as("neighbor_id"), col(labelCol).as("__nl"),
        col(vecCol).as("__cv"), norm(col(vecCol)).as("__cn"))
      .where(col("__cn") > 0)
    val p = probes.select(
        col(idCol).as("probe_id"), col(labelCol).as("__pl"),
        col(vecCol).as("__pv"), norm(col(vecCol)).as("__pn"))
      .where(col("__pn") > 0)
    val scored = c.join(broadcast(p), col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        (col("__nl") === col("__pl")).as("__same"),
        (dot(col("__pv"), col("__cv")) / (col("__pn") * col("__cn"))).as("cosine"))
    val w = Window.partitionBy(col("probe_id"), col("__same"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long")).where(col("rank") <= k)
      .select(col("probe_id"),
        when(col("__same"), lit("pos")).otherwise(lit("neg")).as("kind"),
        col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Per-label embedding outliers: the k vectors FARTHEST from their own
    * label's centroid (lowest cosine) — embedding-space anomaly/quality
    * filtering (mislabeled or off-distribution examples surface first) and
    * the per-class drift drill-down next to [[graft.LlmQueries]]'s q56
    * centroid monitor.
    *
    * Determinism: the centroid is accumulated FIXED-POINT — floor(x·2^20)
    * summed as BIGINT, order-independent, exactly the q56/IVF-Lloyd device
    * — and the cosine against it is the usual sequential fold, so an
    * oracle reproduces both bit-for-bit. Zero-norm vectors are dropped
    * (cosine undefined; the withNorm contract).
    *
    * Shape: one (label, dim) agg on the posexploded scan, a label-keyed
    * join-back (label cardinality rows — broadcast at any corpus scale),
    * map-side cosine, per-label top-k window (group-limited).
    */
  def centroidOutliers(
      vecs: DataFrame, idCol: String, vecCol: String, labelCol: String,
      k: Int, fpScale: Long = 1048576L): DataFrame = {
    val e = vecs.select(col(idCol).as("__id"), col(labelCol).as("__lbl"), col(vecCol).as("__v"))
    val cent = e.select(col("__lbl"), posexplode(col("__v")).as(Seq("__p", "__x")))
      .groupBy(col("__lbl"), col("__p"))
      .agg(count(lit(1)).as("__n"), sum(floor(col("__x") * fpScale).cast("long")).as("__sfp"))
      .groupBy(col("__lbl"))
      .agg(transform(
        array_sort(collect_list(struct(col("__p"),
          (col("__sfp").cast("double") / (lit(fpScale.toDouble) * col("__n"))).as("__c")))),
        x => x.getField("__c")).as("__cv"))
    val scored = e.join(cent, Seq("__lbl"))
      .withColumn("__nrm", norm(col("__v")))
      .where(col("__nrm") > 0)
      .withColumn("__cn", norm(col("__cv")))
      .withColumn("centroid_cos", dot(col("__v"), col("__cv")) / (col("__nrm") * col("__cn")))
    val w = Window.partitionBy(col("__lbl")).orderBy(col("centroid_cos").asc, col("__id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("__lbl").as(labelCol), col("__id").as(idCol), col("centroid_cos"), col("rank"))
  }
}
