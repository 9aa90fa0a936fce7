package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{UnigramExprs, UnigramRuntime}

/** Unigram-LM tokenizer TRAINING (Kudo 2018, "Subword Regularization" —
  * the SentencePiece model family), next to the merge-based [[Bpe]]:
  * instead of growing a vocabulary by greedy pair merges, START from a
  * large substring candidate set and iteratively (a) E-step: Viterbi-
  * segment the corpus under current piece probabilities, (b) M-step:
  * re-estimate probabilities from the segmentation counts, (c) prune
  * the lowest-count pieces — until the vocabulary is the survivors.
  *
  * Faithful simplifications (documented, both standard):
  *  - hard (Viterbi) EM: expected counts come from each word's single
  *    best segmentation rather than the full lattice forward-backward —
  *    the "Viterbi EM" variant; the lattice E-step drops into the same
  *    dataflow (the per-word kernel changes, nothing else);
  *  - pruning by lowest expected count rather than exact
  *    likelihood-loss-if-removed: the count IS the dominant term of the
  *    loss at fixed piece length, and the proxy keeps every quantity an
  *    exact integer.
  *
  * Scale design (the [[Bpe]] discipline): corpus -> distinct-word
  * frequency table is the ONE corpus-sized shuffle; every EM round then
  * runs on the WORD table (vocab-sized) — one codegen'd Viterbi pass +
  * one piece-count shuffle bounded by |vocab|. The vocabulary itself is
  * collected per round: it is the MODEL PARAMETER being learned
  * (seedSize + alphabet rows, the [[Bpe]] argmax / [[Ivf]] centroid
  * collect device), and it ships back as a plan-constant piece table
  * ([[graft.functions.UnigramViterbi]], the fastText table precedent).
  *
  * Determinism: scores are fixed-point integer log2 probabilities
  * ([[UnigramRuntime.log2fp]] — bit-exact, no libm), DP ties resolve
  * (fewer pieces, longest-first scan), seed selection and pruning order
  * by (cnt, piece) — every round's vocabulary is bit-identical at any
  * parallelism, and an in-memory reference replays the whole training
  * run (the PropertySpec law).
  */
object Unigram {

  /** Learn a unigram-LM vocabulary from `docs(textCol)`. Returns
    * (piece, cnt, score_fp): the surviving pieces with their final
    * Viterbi-EM expected counts and Q16 log2-prob scores.
    *
    * Single-character pieces are never pruned and their counts floor at
    * 1 — total segmentation coverage by construction. `pruneNum/Den` of
    * the multi-char pieces (lowest expected count first) drop per
    * round.
    */
  def train(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String,
      maxPieceLen: Int = 4,
      seedSize: Int = 300,
      emRounds: Int = 3,
      pruneNum: Int = 1,
      pruneDen: Int = 5): DataFrame = {
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    require(emRounds >= 1, s"emRounds must be >= 1, got $emRounds")
    require(pruneNum >= 0 && pruneDen > 0 && pruneNum < pruneDen,
      s"prune fraction must be in [0,1): $pruneNum/$pruneDen")
    def collectPairs(df: DataFrame): Array[(String, Long)] =
      df.collect().map(r => (r.getString(0), r.getLong(1)))

    // the ONE corpus-sized shuffle: distinct words + corpus frequencies
    val words = docs
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // seed candidates: every substring up to maxPieceLen, weighted by
    // word frequency (positional occurrences count — the standard seed);
    // vocab-sized shuffle, model-sized collect
    val subs = words
      .select(col("freq"), explode(expr(
        s"flatten(transform(sequence(1, length(w)), i -> " +
          s"transform(sequence(i, least(length(w), i + ${maxPieceLen - 1})), " +
          s"j -> substring(w, i, j - i + 1))))")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
    val singles = collectPairs(subs.where(length(col("piece")) === 1))
    val multiSeed = collectPairs(subs.where(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(seedSize))

    var vocab: Array[(String, Long)] =
      (singles ++ multiSeed).sortBy(_._1)

    for (_ <- 1 to emRounds) {
      val total = vocab.map(_._2).sum
      val pieces = vocab.map(_._1)
      val scores = vocab.map { case (_, c) =>
        UnigramRuntime.log2fp(c) - UnigramRuntime.log2fp(total)
      }
      // E-step: Viterbi counts over the WORD table (vocab-sized pass,
      // codegen'd kernel, piece table as plan constant)
      val counts = collectPairs(words
        .select(
          explode(UnigramExprs.unigramViterbi(col("w"), pieces, scores, maxPieceLen))
            .as("piece"), col("freq"))
        .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))).toMap
      // M-step + prune: multi-char pieces drop the bottom pruneNum/Den
      // by (cnt asc, piece desc); single chars survive with a count
      // floor of 1 (coverage)
      val withCnt = vocab.map { case (p, _) => (p, counts.getOrElse(p, 0L)) }
      val (sgl, multi) = withCnt.partition(_._1.length == 1)
      val keepN = multi.length - multi.length * pruneNum / pruneDen
      val kept = multi.sortBy { case (p, c) => (-c, p) }.take(keepN).filter(_._2 > 0L)
      vocab = (sgl.map { case (p, c) => (p, math.max(1L, c)) } ++ kept).sortBy(_._1)
    }

    words.unpersist()
    val total = vocab.map(_._2).sum
    val rows = vocab.toSeq.map { case (p, c) =>
      org.apache.spark.sql.Row(p, c, UnigramRuntime.log2fp(c) - UnigramRuntime.log2fp(total))
    }
    mkVocabDf(spark, rows)
  }

  private def mkVocabDf(spark: SparkSession,
      rows: Seq[org.apache.spark.sql.Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("piece",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("score_fp",
          org.apache.spark.sql.types.LongType, nullable = false))))

  /** The ENCODE side (q111's shape for the unigram model): segment
    * every whitespace word of `df(textCol)` under a trained vocabulary
    * ([[train]]'s output frame) and return the input rows with a
    * `pieces` array column appended. The vocab collects to a
    * plan-constant piece table (model-sized — the same contract as
    * training); segmentation is the codegen'd Viterbi kernel, one
    * map-side pass, no shuffle.
    */
  def tokenize(df: DataFrame, textCol: String, vocabDf: DataFrame,
      maxPieceLen: Int = 4): DataFrame = {
    val vocab = vocabDf.select(col("piece"), col("score_fp"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val pieces = vocab.map(_._1)
    val scores = vocab.map(_._2)
    df.withColumn("pieces",
      UnigramExprs.unigramTokenize(col(textCol), pieces, scores, maxPieceLen))
  }
}
