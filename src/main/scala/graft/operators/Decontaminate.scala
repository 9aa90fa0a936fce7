package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Test-set decontamination: remove training documents that share a word
  * n-gram with a held-out benchmark/eval set — the standard pre-training
  * hygiene stage (GPT-3 used 13-gram collision; the n is a parameter
  * because real pipelines tune it per benchmark).
  *
  * Pipeline (both sides map-side until the one semi-join):
  *   1. banlist: the DISTINCT n-grams of the benchmark set — benchmarks
  *      are orders of magnitude smaller than the corpus, so this table is
  *      tiny and usually broadcast (left to AQE: a giant banlist must
  *      shuffle, and forcing broadcast would OOM executors);
  *   2. corpus docs explode to (id, n-gram) pairs scan-side (native
  *      shingle expression, no UDF);
  *   3. one LEFT SEMI join on the n-gram STRING marks contaminated ids —
  *      exact by construction: no hash step, so no false drops from
  *      collisions. (At 100 TB the shuffle-bytes optimization is to
  *      semi-join on an 8-byte n-gram hash and re-verify the string on
  *      the survivors; with a broadcast-sized banlist the strings never
  *      shuffle at all, so the simple form is already the fast path.)
  *
  * The contaminated-id set is ids-only; the doc payload re-attaches via
  * semi/anti-join, never riding the n-gram explosion.
  */
object Decontaminate {

  /** Ids of `corpus` docs sharing at least one word `ngram`-gram with
    * `benchmark` (both sides tokenized as lowercased whitespace words).
    * Docs shorter than `ngram` tokens have no n-grams and are never
    * flagged.
    */
  def contaminatedIds(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      ngram: Int): DataFrame = {
    require(ngram >= 1, s"ngram must be >= 1, got $ngram")
    val banlist = benchmark
      .select(explode(TextOps.shingles(TextOps.tokens(col(textCol)), ngram)).as("__g"))
      .distinct()
    corpus
      .select(col(idCol), explode(TextOps.shingles(TextOps.tokens(col(textCol)), ngram)).as("__g"))
      .join(banlist, Seq("__g"), "left_semi")
      .select(col(idCol))
      .distinct()
  }

  /** `corpus` minus the contaminated docs (see [[contaminatedIds]]). */
  def clean(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      ngram: Int): DataFrame =
    corpus.join(
      contaminatedIds(corpus, benchmark, idCol, textCol, ngram),
      Seq(idCol), "left_anti")

  /** Same result as [[clean]] — provably, not approximately — via a
    * bloom pre-filter on the corpus n-gram explosion.
    *
    * [[clean]]'s one shuffle is the n-gram semi-join; when the banlist
    * exceeds the broadcast threshold that join shuffles EVERY corpus
    * n-gram — at 100 TB, the whole corpus × ngram, the dominant cost of
    * the stage. Here the banlist's bloom bitmap (2 bytes/gram at the
    * default 16 bits/key) probes scan-side, so only true collisions plus
    * the ~0.04% false-positive share reach the shuffle. Exactness:
    *  - no false negatives (bloom property + both sides hash the same
    *    string the same way) — every truly contaminated gram survives
    *    the pre-filter, so no doc is wrongly kept;
    *  - false positives (bloom or 64-bit hash collisions) still face the
    *    exact STRING semi-join behind the filter, so no doc is wrongly
    *    dropped.
    */
  def cleanBloom(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      ngram: Int,
      bitsPerKey: Int = 16): DataFrame = {
    require(ngram >= 1, s"ngram must be >= 1, got $ngram")
    val banlist = benchmark
      .select(explode(TextOps.shingles(TextOps.tokens(col(textCol)), ngram)).as("__g"))
      .distinct()
      // two consumers (bloom build's fold + the verify semi-join):
      // materialize once. Same cache-lifetime contract as JaccardJoin's
      // shingle persist — entries live until clearCache()/session end
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bloom = Bloom.build(banlist, col("__g"), bitsPerKey)
    val contaminated = corpus
      .select(col(idCol), explode(TextOps.shingles(TextOps.tokens(col(textCol)), ngram)).as("__g"))
      .where(bloom.mightContain(col("__g")))
      .join(banlist, Seq("__g"), "left_semi")
      .select(col(idCol))
      .distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Per-doc contamination SCORE — the continuous reporting form of
    * [[contaminatedIds]]: for every corpus doc, the share of its
    * DISTINCT n-grams that collide with the benchmark banlist, as exact
    * integer ppm. Pipelines log this audit before committing to a drop
    * threshold (a doc quoting one benchmark sentence and a doc that IS
    * a benchmark doc both "collide", but at very different scores).
    *
    * Shape: distinct (id, gram) pairs (one shuffle), left join against
    * the banlist (benchmark-sized — broadcast when small, AQE decides),
    * one per-doc count/sum agg. Docs with fewer than `ngram` tokens
    * have no n-grams and produce no row.
    */
  def contaminationScore(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      ngram: Int): DataFrame = {
    require(ngram >= 1, s"ngram must be >= 1, got $ngram")
    val banlist = benchmark
      .select(explode(TextOps.shingles(TextOps.tokens(col(textCol)), ngram)).as("__g"))
      .distinct()
      .withColumn("__hit", lit(1L))
    corpus
      .select(col(idCol), explode(TextOps.shingles(TextOps.tokens(col(textCol)), ngram)).as("__g"))
      .distinct()
      .join(banlist, Seq("__g"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .withColumn("score_ppm", expr("(n_hit * 1000000) div n_grams"))
  }
}
