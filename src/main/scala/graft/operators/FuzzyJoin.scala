package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) near-duplicate pairs — the character-level
  * complement of the token-level families (minhash q23, simhash q31,
  * exact Jaccard q41): catches small in-word edits, OCR noise and
  * whitespace drift that token-set similarity under-weights.
  *
  * Scale shape: Levenshtein is O(len·dist) per pair, so the game is the
  * same as every near-dup family here — never run the verifier on the
  * cross product. Candidates come from an EXACT blocking scheme:
  *
  *  1. block equality (caller-named columns, e.g. source or lang):
  *     plain equi-join keys;
  *  2. the length band |len(a) - len(b)| <= maxDist — an exact filter
  *     (edit distance >= length difference) realized as a bucketed
  *     range join ([[RangeJoin]]'s decomposition inlined): one side
  *     keeps its single length-bucket, the other explodes to the <= 2
  *     buckets its ±maxDist band touches, and the join is a HASH join
  *     on (blocks…, bucket) — no nested loop at any corpus size.
  *
  * Both filters are exactness-preserving, so the result is IDENTICAL
  * to brute force (PropertySpec law) — unlike LSH blocking, which
  * would be faster at aggressive thresholds but probabilistic. The
  * verifier is the native banded Levenshtein kernel
  * ([[graft.functions.BoundedLevenshtein]]: O(len·maxDist) primitive-int
  * DP, decode-once, row early-exit) — Spark's builtin threshold
  * `levenshtein` re-decodes codepoints per DP cell and measured ~50×
  * slower on the same candidates; the unbounded O(len²) form is never
  * used.
  *
  * Orientation: pairs are emitted once with idA < idB. Each unordered
  * pair is seen in exactly one orientation (the point side's id below
  * the band side's id) because the band side covers every bucket the
  * point side's length can fall in, and vice versa.
  *
  * At 100 TB: candidates within a block scale with block size, so
  * callers should block as finely as semantics allow (source, lang,
  * near-dup cluster from a cheaper family). The operator shuffles
  * ids+lengths+text once by (blocks, bucket); no index is built —
  * for repeated runs, persist the blocked projection like
  * [[MinHash.writeCorpusIndex]] does for shingles.
  */
object FuzzyJoin {

  /** All pairs (idA < idB) with equal block columns, length difference
    * <= maxDist and levenshtein(textA, textB) <= maxDist, with the
    * exact distance. `lenCol` must hold `length(textCol)` (pass a
    * precomputed column like n_chars, or project `length(text)` first).
    */
  def editDistancePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lenCol: String,
      maxDist: Int,
      blockBy: Seq[String]): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require((idCol +: textCol +: lenCol +: blockBy).forall(docs.columns.contains),
      s"missing columns in docs: wanted id=$idCol text=$textCol len=$lenCol blocks=$blockBy")

    // band span is 2·maxDist, so width 2·maxDist+1 keeps every band
    // inside <= 2 buckets (minimal replication for this filter)
    val w = 2L * maxDist + 1L
    def bkt(c: org.apache.spark.sql.Column) = RangeJoin.fdiv(c, w)

    val base = docs.select(
      (col(idCol).as("__id") +: col(textCol).as("__text") +:
        col(lenCol).cast("long").as("__n") +: blockBy.map(col)): _*)

    val points0 = base.select(
      (col("__id").as("id_a") +: col("__text").as("__text_a") +:
        col("__n").as("__n_a") +: bkt(col("__n")).as("__bkt") +:
        blockBy.map(c => col(c).as(s"__blk_$c"))): _*)
    // The verify DP dominates this operator's cost, and it runs with the
    // JOIN's parallelism. When the bands side broadcasts (small corpora,
    // single-file scans), the join inherits the SCAN's partitioning — a
    // one-file corpus would run every DP on one core. Repartition the
    // points side up to the session's shuffle parallelism in that case;
    // when the scan is already wide (the 100 TB case: thousands of
    // splits) this adds nothing and is skipped.
    val target = docs.sparkSession.sessionState.conf.numShufflePartitions
    val points =
      if (points0.rdd.getNumPartitions >= target) points0
      else points0.repartition(target,
        (col("__bkt") +: blockBy.map(c => col(s"__blk_$c"))): _*)
    val bands = base
      .withColumn("__bkt", explode(sequence(
        bkt(col("__n") - lit(maxDist.toLong)), bkt(col("__n") + lit(maxDist.toLong)))))
      .withColumnRenamed("__id", "id_b")
      .withColumnRenamed("__text", "__text_b")
      .withColumnRenamed("__n", "__n_b")

    val blockEq = blockBy.map(c => col(s"__blk_$c") === col(c))
    val cond = (Seq(
      points("__bkt") === bands("__bkt"),
      col("id_a") < col("id_b"),
      abs(col("__n_a") - col("__n_b")) <= lit(maxDist.toLong)) ++ blockEq).reduce(_ && _)

    joinAndVerify(points, bands, cond, blockBy, maxDist)
  }

  /** Corpus-level removal under the shared keep-lowest-id policy (the
    * same drop rule as [[MinHash.dedupCorpus]], [[SimHash.dedupCorpus]],
    * [[JaccardJoin.dedupCorpus]] and [[Similarity.dedupCorpus]], over
    * edit distance): drop every doc appearing as the HIGHER id of a
    * within-threshold pair. Ids-only shuffle for the anti-join; text
    * never rides past the pair stage.
    */
  def dedupCorpus(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lenCol: String,
      maxDist: Int,
      blockBy: Seq[String]): DataFrame = {
    val drop = editDistancePairs(docs, idCol, textCol, lenCol, maxDist, blockBy)
      .select(col("id_b").as(idCol)).distinct()
    docs.join(drop, Seq(idCol), "left_anti")
  }

  private def joinAndVerify(
      points: DataFrame,
      bands: DataFrame,
      cond: org.apache.spark.sql.Column,
      blockBy: Seq[String],
      maxDist: Int): DataFrame = {
    points.join(bands, cond, "inner")
      // native banded kernel (codepoint-decode once, primitive-int DP):
      // Spark's builtin threshold levenshtein measured ~50x slower here
      .withColumn("dist", graft.functions.HashExprs.boundedLevenshtein(
        col("__text_a"), col("__text_b"), maxDist))
      .where(col("dist") >= 0) // threshold contract: -1 above maxDist
      .select((col("id_a") +: col("id_b") +: blockBy.map(col)) :+ col("dist").cast("long").as("dist"): _*)
  }
}
