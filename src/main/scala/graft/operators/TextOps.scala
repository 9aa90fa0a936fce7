package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for LLM-data pipelines: tokenization,
  * shingling, deterministic string hashing, fingerprinting, token
  * counting, quality scoring and language-ID.
  *
  * Everything here is a pure Catalyst expression (no UDFs) so it stays
  * inside whole-stage codegen and runs scan-side — at 100 TB these are
  * map-only columns computed while the parquet scan streams, with no
  * shuffle and no driver involvement.
  *
  * Cross-engine determinism: the hashes are explicit polynomial rolling
  * hashes over code points with all arithmetic in BIGINT mod 1e9+7, so an
  * oracle engine (DuckDB) can reproduce them bit-for-bit — unlike
  * Spark's builtin `hash`/`xxhash64`, which are engine-private.
  */
object TextOps {

  val Mod: Long = 1000000007L
  val WordSeed: Long = 7L
  val WordMul: Long = 31L
  val DocMul: Long = 1000003L

  /** Whitespace tokens of lowercased text. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Distinct n-gram (word) shingles joined by single spaces,
    * first-occurrence order; fewer than n tokens yields an empty array.
    * Native expression ([[graft.functions.ShingleArray]]) — the
    * `transform`+`concat_ws`+`array_distinct` HOF chain it replaces was
    * interpreted (HOFs never enter codegen) and re-ran once per consuming
    * branch of the minhash pipeline, which made it the bench's biggest
    * single cost (VERDICT r2 #2).
    */
  def shingles(toks: Column, n: Int): Column = graft.functions.HashExprs.shingles(toks, n)

  /** Polynomial rolling hash of a string: fold over code points,
    * acc = (acc*31 + codepoint) mod 1e9+7, acc0 = 7 — reproducible in the
    * oracle as a fold over 1-indexed `substr` positions. Native kernel
    * (the single-element form of [[polyHashAll]]); the interpreted
    * `aggregate(transform(sequence(...)))` twin it replaces ran one
    * lambda dispatch per character.
    */
  def polyHash(s: Column): Column =
    element_at(graft.functions.HashExprs.polyHashArray(array(s)), 1)

  /** Deterministic corpus split: polyHash(text) mod `buckets` — the
    * reproducible train/validation assignment a training pipeline needs
    * (stable across runs, engines and cluster layouts; never `rand()`).
    */
  def hashBucket(s: Column, buckets: Int): Column =
    pmod(polyHash(s), lit(buckets.toLong))

  /** Per-element polynomial hashes of an array of strings. Native
    * expression (identical math to [[polyHash]]) — tokenized docs hash
    * hundreds of elements per row, too hot for interpreted lambdas.
    */
  def polyHashAll(arr: Column): Column = graft.functions.HashExprs.polyHashArray(arr)

  /** Order-sensitive document fingerprint: fold of word hashes,
    * acc = (acc*1000003 + wordHash) mod 1e9+7. Two documents with the
    * same word sequence get the same fingerprint; any reorder/edit
    * changes it (mod collisions aside).
    */
  def docFingerprint(toks: Column): Column =
    aggregate(polyHashAll(toks), lit(WordSeed), (acc, h) => (acc * DocMul + h) % Mod)

  /** POSITIONAL k-gram strings (single-space-joined), one per position —
    * NOT [[shingles]], which dedupes: winnowing windows need the full
    * in-order sequence. Built map-side by successor-zip over the token
    * array (the q88 bigram device, generalized).
    */
  def positionalGrams(toks: Column, k: Int): Column = {
    require(k >= 1, s"gram size must be >= 1, got $k")
    transform(
      slice(toks, lit(1), greatest(size(toks) - (k - 1), lit(0))),
      (x, i) => concat_ws(" ", Seq(x) ++ (2 to k).map(j => element_at(toks, i + lit(j))): _*))
  }

  /** COUNTED positional k-grams: array<struct<g, c>> of distinct grams
    * with occurrence counts, sorted by gram — the map-side half of a
    * per-doc gram-count GROUP BY ([[graft.functions.HashExprs.gramRunCounts]]).
    * Exploding this reproduces `explode(positionalGrams) → groupBy(doc,
    * gram) → count` with the count collapsed INSIDE the row: the
    * corpus-sized shuffle of every gram occurrence disappears, which is
    * the difference between shuffling ~token-count rows and shuffling
    * nothing at 100 TB (consumers that need corpus-level gram totals
    * still aggregate, but over per-doc DISTINCT grams, pre-combined).
    */
  def gramCounts(toks: Column, k: Int): Column =
    graft.functions.HashExprs.gramRunCounts(toks, k)

  /** Winnowing fingerprints (Schleimer, Wilkerson, Aiken: "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD'03 — the MOSS
    * device): hash every positional k-gram, then keep the MINIMUM hash of
    * each w-long window, distinct. Guarantees: any shared run of
    * k + w - 1 tokens between two documents yields at least one shared
    * fingerprint, while storing only ~2/(w+1) of the gram hashes —
    * the local-fingerprint-selection trade minhash (global, probabilistic)
    * and [[docFingerprint]] (whole-doc) don't offer.
    *
    * Entirely map-side (array expressions over the row); documents with
    * at least one gram but fewer than w emit their single global min, so
    * every non-trivial doc carries >= 1 fingerprint. Hashes are the
    * engine's standard mod-1e9+7 polyhash — oracle-reproducible.
    */
  def winnowFingerprints(toks: Column, k: Int, w: Int): Column =
    graft.functions.HashExprs.winnowMins(
      graft.functions.HashExprs.positionalGramHashes(toks, k), w)

  /** Whitespace token count. */
  def tokenCount(toks: Column): Column = size(toks).cast("long")

  /** BPE-ish subtoken count: each word contributes ceil(len/4) subtokens
    * (the ~4-chars-per-token heuristic used to size LLM training budgets).
    * Pure integer arithmetic: (len + 3) div 4.
    */
  def subtokenCount(toks: Column): Column =
    aggregate(
      transform(toks, w => ((length(w) + 3) / 4).cast("long")),
      lit(0L),
      (acc, c) => acc + c)

  /** Count of tokens (with multiplicity) that appear in `words`. Native
    * expression ([[graft.functions.WordSetCount]]) — the
    * `size(filter(isin))` HOF it replaces ran interpreted in the hot map
    * stage of language-ID (5 sets per doc) and quality scoring.
    */
  def wordCount(toks: Column, words: Seq[String]): Column =
    graft.functions.HashExprs.wordSetCount(toks, words)

  /** English-ish stopwords present in the synthetic corpus vocabulary. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Tokens with every exact match of `banned` removed — the
    * normalization / scrub stage (stopword strip, ban-term removal,
    * PII-token drop once an upstream tagger rewrote spans to sentinel
    * tokens). Map-side only; pair with [[wordCount]] (native) for the
    * removed-count audit column so the hot counting path stays codegen'd.
    */
  def scrubTokens(toks: Column, banned: Seq[String]): Column =
    filter(toks, w => !w.isin(banned: _*))

  /** Quality-score components + composite. Ratios are single double
    * divisions of exactly-derived integer operands; the composite is a
    * fixed-order linear combination — deterministic IEEE arithmetic, so
    * an oracle reproduces it bit-for-bit.
    *
    * Returns (n_tokens, n_chars, stop_ratio, avg_word_len, quality).
    */
  def qualityScore(text: Column): QualityParts = {
    val toks = tokens(text)
    val nTok = tokenCount(toks)
    val nChars = length(text).cast("long")
    val nStop = wordCount(toks, Stopwords)
    val sumWordLen = aggregate(transform(toks, w => length(w).cast("long")), lit(0L), _ + _)
    val stopRatio = nStop.cast("double") / nTok.cast("double")
    val avgWordLen = sumWordLen.cast("double") / nTok.cast("double")
    val lenScore = least(nTok.cast("double") / lit(100.0), lit(1.0))
    val quality = lenScore * lit(0.5) + stopRatio * lit(0.2) + avgWordLen / lit(10.0) * lit(0.3)
    QualityParts(nTok, nChars, stopRatio, avgWordLen, quality)
  }

  final case class QualityParts(
      nTokens: Column, nChars: Column, stopRatio: Column, avgWordLen: Column, quality: Column)

  /** Marker-word language-ID: score each candidate language by marker-word
    * hits; predict the highest score with fixed precedence order on ties
    * (the order of `markers`). A real system would use char-n-gram
    * profiles; the *shape* — per-doc map-side scoring, no shuffle — is
    * identical, and this stays oracle-expressible.
    */
  def languageId(toks: Column, markers: Seq[(String, Seq[String])]): (Seq[Column], Column) = {
    val scores = markers.map { case (lang, words) => wordCount(toks, words).as(s"score_$lang") }
    val scoreCols = markers.map { case (_, words) => wordCount(toks, words) }
    // argmax as a CASE cascade: lang_i wins when its score >= every later
    // score; CASE order gives earlier languages precedence on ties. The
    // same cascade is written verbatim in the oracle SQL.
    val pred = markers.indices.init.foldRight(lit(markers.last._1)) { (i, elseCol) =>
      val beatsRest = (i + 1 until markers.size).map(j => scoreCols(i) >= scoreCols(j)).reduce(_ && _)
      when(beatsRest, lit(markers(i)._1)).otherwise(elseCol)
    }
    (scores, pred)
  }
}
