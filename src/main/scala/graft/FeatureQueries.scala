package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators._

/** Round-6 training-data curation queries: model-adjacent pipeline stages
  * — quality-classifier inference (the fastText-style gate every modern
  * pretraining corpus passes through), content-defined chunking (the
  * insertion-robust chunk dedup CDC storage systems use), time-range
  * behavioral features, exact robust statistics, and the BPE pair-count
  * step of tokenizer training.
  *
  * Same oracle-exactness conventions as [[LlmQueries]] /
  * [[PipelineQueries]]: integer/decimal arithmetic end-to-end,
  * deterministic row sets, explicit ORDER BY in both engines.
  */
object FeatureQueries {

  private def T = Tables

  private val docTokens = TextOps.tokens(col("text"))

  /** Deterministic pseudo-weight for a hashed feature bucket: Knuth
    * multiplicative scramble into a signed integer weight in
    * [-500001, 500001]. Stands in for a trained linear model's weight
    * table — the INFERENCE dataflow (hash features scan-side, no
    * weight-table shuffle) is the real, tested part; swapping in real
    * weights is a broadcast-join or literal-map change, not a new plan.
    */
  private def bucketWeight(bucket: Column): Column =
    (bucket * lit(2654435761L)) % lit(1000003L) - lit(500001L)

  val all: Seq[Q] = Seq(

    // -------------------------------------- linear quality classifier
    Q("q96_quality_classifier",
      (s, d) => {
        // fastText-style linear classifier INFERENCE over the corpus:
        // hashing-trick features (token polyhash mod 2^18 buckets),
        // per-bucket weight, doc score = sum of token weights, gate at
        // score > 0. The shape of every learned quality/toxicity filter
        // pass: entirely scan-side (hash + weight + sum are map-only,
        // ZERO shuffle for the scoring itself), all-BIGINT so the oracle
        // replays it bit-for-bit. At 100 TB a real weight table rides the
        // same plan as a 2^18-entry broadcast instead of the formula.
        val buckets = 262144L
        val score = aggregate(
          transform(TextOps.polyHashAll(docTokens),
            h => bucketWeight(pmod(h, lit(buckets)))),
          lit(0L), (acc, w) => acc + w)
        T.documents(s, d)
          .select(col("doc_id"), col("source"), score.as("score"))
          .withColumn("keep", (col("score") > 0).cast("boolean"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH t AS (SELECT doc_id, source, string_split(lower(text), ' ') AS w FROM documents),
        h AS (SELECT doc_id, source, list_transform(w, x ->
                list_reduce(list_prepend(CAST(7 AS BIGINT),
                  list_transform(range(1, length(x)+1), i -> CAST(ascii(substr(x, i, 1)) AS BIGINT))),
                  (a, c) -> (a*31 + c) % 1000000007)) AS hh FROM t),
        sc AS (SELECT doc_id, source,
                CAST(coalesce(list_sum(list_transform(hh, v ->
                  ((v % 262144) * 2654435761) % 1000003 - 500001)), 0) AS BIGINT) AS score
               FROM h)
        SELECT doc_id, source, score, score > 0 AS keep
        FROM sc ORDER BY doc_id"""),
      "linear quality-classifier inference (the fastText-gate shape): hashing-trick " +
        "features (polyhash mod 2^18), per-bucket weight, all-BIGINT doc score — " +
        "scoring is map-only scan-side work with zero shuffle; a trained weight " +
        "table swaps in as a 2^18-entry broadcast on the identical plan"),

    // ------------------------------------ content-defined chunking dedup
    Q("q97_cdc_chunks",
      (s, d) => {
        // content-defined chunking (the FastCDC/rsync device on tokens):
        // chunk boundaries AFTER tokens whose polyhash % 16 == 0, so
        // chunk edges depend on CONTENT, not position — inserting a
        // paragraph shifts byte offsets but reproduces every unchanged
        // chunk, which fixed-width chunking (q73) cannot. Emitted here:
        // the cross-doc duplicated chunks (df >= 2) a chunk-level dedup
        // would collapse. All map-side until the one chunk-hash groupBy.
        val toks = docTokens
        val h = TextOps.polyHashAll(toks)
        // 1-based boundary positions (token i closes a chunk), then
        // chunk j = tokens (bounds[j]+1 .. bounds[j+1]) joined — pure
        // array expressions, no explode until chunks exist
        val bpos = filter(sequence(lit(1), size(toks)),
          i => element_at(h, i) % 16 === 0 && i < size(toks))
        val bounds = concat(array(lit(0)), bpos, array(size(toks)))
        val chunks = filter(
          transform(sequence(lit(1), size(bounds) - 1), j =>
            array_join(
              slice(toks, element_at(bounds, j) + 1,
                element_at(bounds, j + 1) - element_at(bounds, j)),
              " ")),
          c => c =!= "")
        T.documents(s, d)
          .select(col("doc_id"), explode(chunks).as("chunk"))
          .groupBy(TextOps.polyHash(col("chunk")).as("chunk_hash"))
          .agg(countDistinct(col("doc_id")).as("df"),
            count(lit(1)).as("occurrences"))
          .where(col("df") >= 2)
          .orderBy(col("df").desc, col("chunk_hash"))
      },
      Some("""
        WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        h AS (SELECT doc_id, w, list_transform(w, x ->
                list_reduce(list_prepend(CAST(7 AS BIGINT),
                  list_transform(range(1, length(x)+1), i -> CAST(ascii(substr(x, i, 1)) AS BIGINT))),
                  (a, c) -> (a*31 + c) % 1000000007)) AS hh FROM t),
        b AS (SELECT doc_id, w,
                list_concat(list_concat([0],
                  list_filter(range(1, len(w)+1), i -> hh[i] % 16 = 0 AND i < len(w))),
                  [len(w)]) AS bounds FROM h),
        c AS (SELECT doc_id, unnest(list_filter(
                list_transform(range(1, len(bounds)), j ->
                  array_to_string(w[bounds[j]+1:bounds[j+1]], ' ')),
                x -> x <> '')) AS chunk FROM b),
        ch AS (SELECT doc_id, list_reduce(list_prepend(CAST(7 AS BIGINT),
                 list_transform(range(1, length(chunk)+1), i -> CAST(ascii(substr(chunk, i, 1)) AS BIGINT))),
                 (a, c) -> (a*31 + c) % 1000000007) AS chunk_hash FROM c)
        SELECT chunk_hash, count(DISTINCT doc_id) AS df, count(*) AS occurrences
        FROM ch GROUP BY chunk_hash HAVING count(DISTINCT doc_id) >= 2
        ORDER BY df DESC, chunk_hash"""),
      "content-defined chunking (FastCDC on tokens): boundaries where the token " +
        "polyhash % 16 == 0, so chunks survive insertions/shifts — the chunk-level " +
        "dedup fixed windows can't do; boundary detection and chunk assembly are " +
        "array expressions scan-side, one chunk-hash shuffle total"),

    // ----------------------------------------- time-range event features
    Q("q98_time_features",
      (s, d) => {
        // behavioral feature extraction: per event, the same user's
        // activity in the trailing hour — a RANGE (time-interval) frame,
        // not q16's ROWS frames: peers with equal ts are in-frame, and
        // frame width is wall-clock, not row-count. Micros-integer
        // ordering in BOTH engines so frame edges are exact. One
        // user_id shuffle; window state is bounded by the hour.
        val us = Q.epochUs(col("ts"))
        val w = Window.partitionBy(col("user_id")).orderBy(us)
          .rangeBetween(-3600000000L, 0L)
        T.events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
          .withColumn("n_1h", count(lit(1)).over(w))
          .withColumn("sum_1h",
            sum(Q.dec2s(col("value"))).over(w).cast("double"))
          .select(col("event_id"), col("user_id"), Q.epochUs(col("ts")).as("ts_us"),
            col("n_1h"), col("sum_1h"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT event_id, user_id, epoch_us(ts) AS ts_us,
               count(*) OVER w AS n_1h,
               CAST(sum(CAST(value AS DECIMAL(10,2))) OVER w AS DOUBLE) AS sum_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        ORDER BY event_id"""),
      "trailing-1h behavioral features per event (RANGE interval frame over epoch " +
        "micros — wall-clock width, equal-ts peers in frame, unlike ROWS frames): " +
        "the feature-extraction shape for behavioral training data; one user_id " +
        "shuffle, frame state bounded by the hour, DECIMAL sums exact"),

    // --------------------------------------------- exact robust statistics
    Q("q99_median_stats",
      (s, d) => {
        // exact median + discrete p90 per event_type WITHOUT interpolated
        // percentile builtins: engines interpolate in floating point with
        // different expression trees (a+(b-a)f vs (1-f)a+fb), which can
        // diverge in the last ulp and fail a hash gate. Rank arithmetic
        // + DECIMAL averaging is bit-exact: odd n takes the middle row,
        // even n averages the two middles in DECIMAL (exact). p90 is the
        // discrete ceil-rank value (quantile_disc). One shuffle + one
        // in-partition window pass.
        // middle picker: rn*2 ∈ {n, n+1, n+2} selects exactly the middle
        // row (odd n, rn*2 = n+1) or the two middles (even n, rn*2 = n or
        // n+2) — the parities can't cross. Averaging divides by 1 or 2:
        // both exact in double (the sum itself is exact DECIMAL).
        val v = Q.dec2s(col("value"))
        val rn = row_number().over(
          Window.partitionBy(col("event_type")).orderBy(col("v"), col("event_id")))
        val n = count(lit(1)).over(Window.partitionBy(col("event_type")))
        val isMid = col("rn") * 2 >= col("n") && col("rn") * 2 <= col("n") + 2
        T.events(s, d)
          .select(col("event_type"), col("event_id"), v.as("v"))
          .withColumn("rn", rn).withColumn("n", n)
          .groupBy(col("event_type"))
          .agg(
            max(col("n")).as("n_events"),
            (sum(when(isMid, col("v"))).cast("double") /
              sum(when(isMid, lit(1L)))).as("median"),
            max(when(col("rn") === expr("(n * 9 + 9) div 10"), col("v")))
              .cast("double").as("p90_disc"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH v AS (SELECT event_type, event_id, CAST(value AS DECIMAL(10,2)) AS v FROM events),
        r AS (SELECT event_type, v,
                row_number() OVER (PARTITION BY event_type ORDER BY v, event_id) AS rn,
                count(*) OVER (PARTITION BY event_type) AS n FROM v)
        SELECT event_type, max(n) AS n_events,
               CAST(sum(CASE WHEN rn * 2 BETWEEN n AND n + 2 THEN v END) AS DOUBLE)
                 / sum(CASE WHEN rn * 2 BETWEEN n AND n + 2 THEN 1 END) AS median,
               CAST(max(CASE WHEN rn = (n * 9 + 9) // 10 THEN v END) AS DOUBLE) AS p90_disc
        FROM r GROUP BY event_type ORDER BY event_type"""),
      "exact median + discrete p90 per event type via rank arithmetic (no " +
        "interpolated percentile builtins — engines' fp interpolation trees can " +
        "diverge by an ulp): even-n medians averaged in DECIMAL (exact), p90 is " +
        "the ceil-rank order statistic; one shuffle, one window pass"),

    // ------------------------------------------------ BPE pair counting
    Q("q100_bpe_pairs",
      (s, d) => {
        // tokenizer training, step 1 of BPE: frequency of adjacent
        // character pairs across the corpus (the argmax pair becomes the
        // first merge). Pairs are built map-side as 2-char substrings —
        // positional successor-zip on characters, the q88 bigram device
        // one level down. One pair shuffle; vocabulary-sized result.
        T.documents(s, d)
          .select(explode(docTokens).as("tok"))
          .where(length(col("tok")) >= 2)
          .select(explode(transform(sequence(lit(1), length(col("tok")) - 1),
            i => col("tok").substr(i, lit(2)))).as("pair"))
          .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("pair"))
          .limit(30)
      },
      Some("""
        WITH t AS (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents),
        p AS (SELECT unnest(list_transform(range(1, length(tok)), i ->
                substr(tok, i, 2))) AS pair
              FROM t WHERE length(tok) >= 2)
        SELECT pair, count(*) AS cnt FROM p
        GROUP BY pair ORDER BY cnt DESC, pair LIMIT 30"""),
      "BPE tokenizer training step 1: corpus-wide adjacent character-pair counts " +
        "(the argmax is the first merge rule) — pairs built map-side as positional " +
        "2-char substrings, one pair-key shuffle with map-side partial agg, " +
        "vocabulary^2-bounded result; iterating merges re-runs the same plan " +
        "on re-segmented tokens"))
}
