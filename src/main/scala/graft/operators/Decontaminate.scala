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
}
