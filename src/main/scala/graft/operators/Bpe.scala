package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units"): start from
  * characters (with an end-of-word marker on the last one) and
  * iteratively merge the corpus's most frequent adjacent symbol pair —
  * the learned merge list IS the tokenizer.
  *
  * Scale design (100 TB): training operates on the DISTINCT-WORD
  * frequency table, never the corpus — corpus -> (word, freq) is the
  * ONE corpus-sized shuffle; every merge round then runs on vocab-sized
  * frames (pair counts are vocabulary²-bounded, in practice far
  * smaller). That is exactly how reference BPE trainers work, except
  * here the vocab is a DataFrame, so a web-scale vocabulary (hundreds
  * of millions of types) still distributes instead of needing one
  * machine's RAM. Per round: one vocab-sized pair-count shuffle +
  * argmax. The chosen rule is a SCALAR (two symbols + a count)
  * collected to the driver — it is the model parameter being learned,
  * the same bounded, justified collect as [[Ivf]]'s centroid list.
  * Plans stay flat via the checkpoint-every-2-rounds discipline of
  * [[PageRank]].
  *
  * Determinism: argmax ties break by (count DESC, lhs ASC, rhs ASC) —
  * binary string order, reproducible in the oracle engine.
  */
object Bpe {

  final case class MergeRule(step: Int, lhs: String, rhs: String, cnt: Long)

  /** Conf key: distinct-word count at or below which the merge loop
    * runs on the DRIVER over the collected (word, freq) table instead
    * of one Spark job per round. Default 1000000 types (tens of MB of
    * strings) — reference BPE trainers are single-machine programs over
    * exactly this table; the distributed loop exists for web-scale
    * vocabularies (hundreds of millions of types) and still runs above
    * the guard. Same measured-size device as
    * [[Components.LocalEdgeMaxKey]]; the count is one vocab-sized job
    * where the loop previously paid one pair-count job PER ROUND.
    * Set 0 to force the loop.
    */
  val LocalVocabMaxKey = "spark.graft.bpe.localVocabMax"

  /** UTF-8 binary string order — Spark's `orderBy` on a STRING column
    * compares UTF8String bytes, and the driver argmax tiebreak must
    * match it exactly (Java's String.compareTo orders UTF-16 units,
    * which diverges above the BMP).
    */
  private def utf8Lt(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < a.length && i < b.length) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    a.length < b.length
  }

  /** Driver replica of [[charSymbols]]: code-point characters (matching
    * Spark's substr semantics), end-of-word marker on the last.
    */
  private[graft] def charSymbolsLocal(w: String): Array[String] = {
    val cps = w.codePoints.toArray
    cps.zipWithIndex.map { case (cp, i) =>
      val s = new String(Character.toChars(cp))
      if (i == cps.length - 1) s + "</w>" else s
    }
  }

  /** Driver replica of [[mergePair]]'s left fold — same non-overlapping
    * greedy semantics (an applied merge consumes both symbols).
    */
  private[graft] def mergePairLocal(
      toks: Array[String], a: String, b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
    var i = 0
    while (i < toks.length) {
      if (out.nonEmpty && out.last == a && toks(i) == b)
        out(out.length - 1) = a + b
      else out += toks(i)
      i += 1
    }
    out.toArray
  }

  /** The whole merge loop on the driver — the local fast path of
    * [[learnMergesWithVocab]]. Same recurrence: overlapping adjacent-
    * pair counts weighted by word frequency, argmax with
    * (cnt DESC, lhs ASC, rhs ASC) in UTF-8 binary order, greedy
    * non-overlapping merge. Integer sums commute, so iteration order is
    * irrelevant; equality with the distributed loop is a PropertySpec
    * law. Returns (rules, final (w, freq, toks) vocabulary).
    */
  private[graft] def learnLocal(
      vocab: Array[(String, Long)],
      nMerges: Int): (Seq[MergeRule], Array[(String, Long, Array[String])]) = {
    var words = vocab.map { case (w, f) => (w, f, charSymbolsLocal(w)) }
    val rules = scala.collection.mutable.ArrayBuffer.empty[MergeRule]
    var step = 1
    var done = false
    while (step <= nMerges && !done) {
      val cnt = new scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (_, f, toks) =>
        var j = 0
        while (j < toks.length - 1) {
          val k = (toks(j), toks(j + 1))
          cnt(k) = cnt.getOrElse(k, 0L) + f
          j += 1
        }
      }
      if (cnt.isEmpty) done = true
      else {
        val ((a, b), c) = cnt.foldLeft(Option.empty[((String, String), Long)]) {
          case (best, cand @ ((ca, cb), cc)) => best match {
            case None => Some(cand)
            case Some(((ba, bb), bc)) =>
              val better = cc > bc ||
                (cc == bc && (utf8Lt(ca, ba) ||
                  (ca == ba && utf8Lt(cb, bb))))
              if (better) Some(cand) else best
          }
        }.get
        rules += MergeRule(step, a, b, c)
        words = words.map { case (w, f, toks) =>
          (w, f, mergePairLocal(toks, a, b))
        }
        step += 1
      }
    }
    (rules.toSeq, words)
  }

  /** Initial symbol sequence of a word: its characters, with the
    * end-of-word marker appended to the last one (Sennrich's `</w>` —
    * merges never cross word boundaries, and word-final units stay
    * distinct from word-internal ones).
    */
  private def charSymbols(w: Column): Column = {
    val n = length(w)
    transform(sequence(lit(1), n), i =>
      when(i === n, concat(w.substr(i, lit(1)), lit("</w>")))
        .otherwise(w.substr(i, lit(1))))
  }

  /** One greedy, non-overlapping, left-to-right merge pass of pair
    * (a, b) over a symbol array: a sequential left fold — an applied
    * merge consumes both symbols, and the merged symbol (a+b, strictly
    * longer than a) can never itself be the left side of another merge
    * in the same pass. For runs of a self-pair (a a a a -> aa aa) this
    * merges at every other position from the run start — Sennrich's
    * non-overlapping regex-replace semantics exactly.
    */
  private[graft] def mergePair(toks: Column, a: String, b: String): Column =
    aggregate(toks, typedLit(Seq.empty[String]), (acc, t) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && t === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(t))))

  /** Learn the first `nMerges` BPE merge rules from `docs(textCol)`
    * (whitespace words of lowercased text; empty tokens dropped).
    * Returns (step, lhs, rhs, cnt) — step 1-based, cnt = the merged
    * pair's corpus frequency at selection time. Stops early if the
    * vocabulary runs out of adjacent pairs.
    */
  def learnMerges(spark: SparkSession, docs: DataFrame, textCol: String, nMerges: Int): DataFrame =
    learnMergesWithVocab(spark, docs, textCol, nMerges)._1

  /** [[learnMerges]] plus the post-merge vocabulary
    * `(w, freq, toks)` — each distinct word's symbol sequence after all
    * learned merges, i.e. its tokenization under the trained model. The
    * encode side reuses this directly: tokenizing the corpus is a
    * vocab-sized join, never a per-occurrence re-fold.
    */
  def learnMergesWithVocab(
      spark: SparkSession, docs: DataFrame, textCol: String, nMerges: Int): (DataFrame, DataFrame) = {
    import spark.implicits._
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val wf = graft.Engine.truncate(docs
      .select(explode(split(lower(col(textCol)), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq")))
    // Local fast path (round-13 optimization; see LocalVocabMaxKey):
    // the loop is vocab-sized by design — when the measured type count
    // fits the driver, the whole 20-round recurrence is a few million
    // string operations, where the distributed loop pays one pair-count
    // job + 1-row collect PER ROUND.
    val localMax = spark.conf.get(LocalVocabMaxKey, "1000000").toLong
    if (wf.count() <= localMax) {
      val vocabArr = wf.collect().map(r => (r.getString(0), r.getLong(1)))
      val (rs, wordsArr) = learnLocal(vocabArr, nMerges)
      val vocabDf = wordsArr.toSeq.map { case (w, f, t) => (w, f, t.toSeq) }
        .toDF("w", "freq", "toks")
      return (rs.toDF(), vocabDf)
    }
    // wf is already truncated; the symbol projection needs no second cut
    var words = wf
      .select(col("w"), col("freq"), charSymbols(col("w")).as("toks"))
    val rules = scala.collection.mutable.ArrayBuffer.empty[MergeRule]
    var step = 1
    var done = false
    while (step <= nMerges && !done) {
      // overlapping adjacent-pair counts weighted by word frequency
      // (vocab-sized shuffle); size >= 2 guard keeps sequence() ascending
      val top = words.where(size(col("toks")) >= 2)
        .select(col("freq"),
          explode(transform(sequence(lit(1), size(col("toks")) - 1),
            j => struct(element_at(col("toks"), j).as("a"),
              element_at(col("toks"), j + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val r = top.head
        val (a, b) = (r.getString(0), r.getString(1))
        rules += MergeRule(step, a, b, r.getLong(2))
        words = words.select(col("w"), col("freq"), mergePair(col("toks"), a, b).as("toks"))
        // non-eager: materializes inside the NEXT round's argmax job
        // instead of paying a separate job per checkpoint (20-round loop
        // = ~10 fewer tiny jobs; frames are vocab-sized either way)
        if (step % 2 == 0) words = graft.Engine.truncate(words, eager = false)
        step += 1
      }
    }
    (rules.toSeq.toDF(), words)
  }

  /** Apply learned merges to a symbol-array column in rule order — the
    * ENCODE side of the tokenizer (each rule is one [[mergePair]]
    * pass). Rules must be the (lhs, rhs) list from [[learnMerges]] in
    * step order.
    */
  def applyMerges(toks: Column, rules: Seq[(String, String)]): Column =
    rules.foldLeft(toks) { case (c, (a, b)) => mergePair(c, a, b) }

  /** Corpus tokenize under a trained vocabulary: per-doc subword count
    * = sum over the doc's word occurrences of the word's post-merge
    * symbol count. `vocab` is the (w, toks) frame of
    * [[learnMergesWithVocab]] — vocab-sized, so the attach join
    * broadcasts; the corpus side is one explode + one idCol shuffle.
    */
  def tokenizeCounts(docs: DataFrame, idCol: String, textCol: String, vocab: DataFrame): DataFrame =
    docs.select(col(idCol), explode(split(lower(col(textCol)), " ")).as("w"))
      .where(col("w") =!= "")
      .join(vocab.select(col("w"), size(col("toks")).cast("long").as("__nsub")), Seq("w"))
      .groupBy(col(idCol)).agg(sum(col("__nsub")).as("n_subwords"))
}
