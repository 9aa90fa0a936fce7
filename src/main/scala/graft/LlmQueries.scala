package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** LLM-training-data pipeline queries over the harness's `documents` and
  * `embeddings` tables: deduplication (exact, minhash-LSH, simhash),
  * similarity search (brute-force + LSH ANN), text analysis (stats,
  * language-ID, quality, token counts, fingerprints) and multimodal
  * column plumbing.
  *
  * Oracle-exactness: all hashes are the explicit mod-1e9+7 polynomial
  * hashes of [[graft.operators.TextOps]] (reproducible in ANSI SQL);
  * Jaccard thresholds compare integers (inter*den >= num*union); cosine
  * similarities fold element products in array order so DuckDB's
  * list_sum reproduces the exact IEEE double.
  */
object LlmQueries {

  private def T = Tables

  private val docTokens = TextOps.tokens(col("text"))

  /** Language marker words (fixed subsets of the synthetic corpus
    * vocabulary; precedence order = this order).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "row", "table"),
    "es" -> Seq("data", "value", "column"),
    "de" -> Seq("window", "group", "order"),
    "fr" -> Seq("line", "part", "filter"),
    "zh" -> Seq("spark", "query", "stream"))

  val all: Seq[Q] = Seq(

    // ------------------------------------------------------- exact dedup
    Q("q22_exact_dedup",
      (s, d) => {
        T.documents(s, d)
          .groupBy(col("text"))
          .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
          .select(col("doc_id"), col("n_copies"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        FROM documents GROUP BY text ORDER BY doc_id"""),
      "exact dedup: deterministic survivor (min id) + multiplicity per distinct text; " +
        "hash-groupBy with map-side partial agg — the 100 TB shape (one shuffle by text hash)"),

    // ------------------------------------------------ minhash LSH dedup
    Q("q23_neardup_pairs",
      (s, d) => {
        MinHash.nearDupPairs(T.documents(s, d), "doc_id", "text")
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
            col("inter_size"), col("union_size"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""
        WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh FROM toks)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter_size,
               CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS union_size
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(a.sh) > 0 AND len(b.sh) > 0
          AND len(list_intersect(a.sh, b.sh)) * 10 >=
              8 * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
        ORDER BY doc_a, doc_b"""),
      "minhash near-dup: shingle->minhash->banded LSH buckets->exact-verify candidates " +
        "(Jaccard >= 0.8, integer-exact). Oracle is all-pairs (oracle-only; the Spark side " +
        "never does all-pairs). k=128, b=32, r=4: miss probability < 1e-14 at J=0.9"),

    // --------------------------------------------------- brute-force ANN
    Q("q24_ann_topk",
      (s, d) => {
        val e = T.embeddings(s, d).select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        Similarity.bruteTopK(e, e.where(col("vec_id") < 10), "vec_id", "v", 5)
          .select(col("probe_id"), col("rank"), col("neighbor_id"), col("cosine"))
          .orderBy(col("probe_id"), col("rank"))
      },
      Some("""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM e),
        p AS (SELECT vec_id, v, nrm FROM n WHERE vec_id < 10),
        s AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
                     list_sum(list_transform(list_zip(p.v, c.v), z -> z[1]*z[2])) / (p.nrm * c.nrm) AS cosine
              FROM n c, p WHERE p.vec_id != c.vec_id),
        r AS (SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
              FROM s)
        SELECT probe_id, rank, neighbor_id, cosine FROM r WHERE rank <= 5
        ORDER BY probe_id, rank"""),
      "similarity search baseline: exact cosine top-5 per probe; probes broadcast, corpus " +
        "scanned once, per-probe top-k. In-order double folds make the cosine bit-identical " +
        "to the oracle. Scale path is q33's LSH buckets"),

    // --------------------------------------------------- text statistics
    Q("q25_text_stats",
      (s, d) => {
        val docs = T.documents(s, d).select(col("lang"), docTokens.as("w"), length(col("text")).cast("long").as("nc"))
        val base = docs.groupBy(col("lang")).agg(
          count(lit(1)).as("n_docs"),
          sum(size(col("w")).cast("long")).as("total_tokens"),
          sum(col("nc")).as("total_chars"))
        val dw = docs.select(col("lang"), explode(col("w")).as("word"))
          .groupBy(col("lang")).agg(countDistinct(col("word")).as("n_distinct_words"))
        base.join(dw, Seq("lang"))
          .withColumn("avg_tokens", col("total_tokens").cast("double") / col("n_docs").cast("double"))
          .orderBy(col("lang"))
      },
      Some("""
        WITH t AS (SELECT lang, string_split(lower(text), ' ') AS w, length(text) AS nc FROM documents),
        base AS (SELECT lang, count(*) AS n_docs, CAST(sum(len(w)) AS BIGINT) AS total_tokens,
                        CAST(sum(nc) AS BIGINT) AS total_chars
                 FROM t GROUP BY lang),
        dw AS (SELECT lang, count(DISTINCT uw) AS n_distinct_words
               FROM (SELECT lang, unnest(w) AS uw FROM t) GROUP BY lang)
        SELECT base.lang, n_docs, total_tokens, total_chars, n_distinct_words,
               CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avg_tokens
        FROM base JOIN dw ON base.lang = dw.lang ORDER BY base.lang"""),
      "per-language corpus stats: doc/token/char counts + distinct vocabulary " +
        "(explode + two-level agg: partial distinct by (lang,word) then merge — scalable)"),

    // ------------------------------------------------------- language-ID
    Q("q26_language_id",
      (s, d) => {
        val (scores, pred) = TextOps.languageId(docTokens, LangMarkers)
        T.documents(s, d)
          .select((col("doc_id") +: col("lang") +: scores) :+ pred.as("pred_lang"): _*)
          .orderBy(col("doc_id"))
      },
      Some {
        val scoreExprs = LangMarkers.map { case (lang, words) =>
          val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
          s"CAST(len(list_filter(string_split(lower(text), ' '), x -> list_contains($lst, x))) AS BIGINT) AS score_$lang"
        }.mkString(",\n               ")
        val langs = LangMarkers.map(_._1)
        val cases = langs.init.zipWithIndex.map { case (l, i) =>
          val conds = langs.drop(i + 1).map(o => s"score_$l >= score_$o").mkString(" AND ")
          s"WHEN $conds THEN '$l'"
        }.mkString("\n                    ")
        s"""
        WITH s AS (SELECT doc_id, lang,
               $scoreExprs
        FROM documents)
        SELECT doc_id, lang, ${langs.map(l => s"score_$l").mkString(", ")},
               CASE $cases
                    ELSE '${langs.last}' END AS pred_lang
        FROM s ORDER BY doc_id"""
      },
      "marker-word language-ID: per-doc scoring of fixed word lists, argmax with fixed " +
        "precedence — map-only, no shuffle, oracle-identical CASE cascade"),

    // ----------------------------------------------------- quality score
    Q("q27_quality_score",
      (s, d) => {
        val qp = TextOps.qualityScore(col("text"))
        T.documents(s, d).select(
            col("doc_id"),
            qp.nTokens.as("n_tokens"),
            qp.nChars.as("n_chars"),
            qp.stopRatio.as("stop_ratio"),
            qp.avgWordLen.as("avg_word_len"),
            qp.quality.as("quality"))
          .orderBy(col("doc_id"))
      },
      Some {
        val stop = TextOps.Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
        s"""
        WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w, length(text) AS nc FROM documents),
        m AS (SELECT doc_id,
                     CAST(len(w) AS BIGINT) AS n_tokens,
                     CAST(nc AS BIGINT) AS n_chars,
                     CAST(len(list_filter(w, x -> list_contains($stop, x))) AS BIGINT) AS n_stop,
                     CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS sum_wlen
              FROM t)
        SELECT doc_id, n_tokens, n_chars,
               CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
               CAST(sum_wlen AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS avg_word_len,
               least(CAST(n_tokens AS DOUBLE) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.5 AS DOUBLE)
                 + (CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * CAST(0.2 AS DOUBLE)
                 + (CAST(sum_wlen AS DOUBLE) / CAST(n_tokens AS DOUBLE)) / CAST(10.0 AS DOUBLE) * CAST(0.3 AS DOUBLE)
                 AS quality
        FROM m ORDER BY doc_id"""
      },
      "document quality scoring: length/stopword/word-length components + fixed-order " +
        "linear composite (bit-deterministic double arithmetic); map-only"),

    // ------------------------------------------------------ token counts
    Q("q28_token_count",
      (s, d) => {
        T.documents(s, d).select(
            col("doc_id"),
            TextOps.tokenCount(docTokens).as("n_tokens"),
            TextOps.subtokenCount(docTokens).as("n_subtokens"),
            size(array_distinct(docTokens)).cast("long").as("n_distinct_tokens"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)
        SELECT doc_id,
               CAST(len(w) AS BIGINT) AS n_tokens,
               CAST(list_sum(list_transform(w, x -> (length(x) + 3) // 4)) AS BIGINT) AS n_subtokens,
               CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct_tokens
        FROM t ORDER BY doc_id"""),
      "token counting: whitespace tokens + BPE-ish budget (ceil(len/4) subtokens per word) " +
        "+ distinct tokens; pure integer arithmetic, map-only"),

    // ------------------------------------------------------ fingerprints
    Q("q29_fingerprint",
      (s, d) => {
        T.documents(s, d).select(
            col("doc_id"),
            TextOps.docFingerprint(docTokens).as("fp"),
            array_min(TextOps.polyHashAll(docTokens)).as("min_word_hash"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        h AS (SELECT doc_id,
                     list_transform(w, x ->
                       list_reduce(list_prepend(CAST(7 AS BIGINT),
                         list_transform(range(1, length(x)+1), i -> CAST(ascii(substr(x, i, 1)) AS BIGINT))),
                         (a, c) -> (a*31 + c) % 1000000007)) AS wh
              FROM t)
        SELECT doc_id,
               list_reduce(list_prepend(CAST(7 AS BIGINT), wh),
                           (acc, x) -> (acc*1000003 + x) % 1000000007) AS fp,
               CAST(list_min(wh) AS BIGINT) AS min_word_hash
        FROM h ORDER BY doc_id"""),
      "document fingerprinting: order-sensitive polynomial rolling hash over word hashes " +
        "(mod 1e9+7, reproduced exactly by the oracle) + min word hash; map-only"),

    // ----------------------------------------------- embedding near-dups
    Q("q30_embedding_neardup",
      (s, d) => {
        val e = T.embeddings(s, d).select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        // LSH candidate generation (no all-pairs join in the plan — pinned
        // by PlanSpec); every candidate is exactly re-scored, so precision
        // is 1 and the all-pairs oracle still applies. tables=128/planes=8
        // is verified to reach recall 1.0 on this corpus at sf0.01 (the
        // gate's scale); see Similarity's class doc for the low-threshold
        // candidate-volume tradeoff.
        Similarity.cosinePairsLsh(e, "vec_id", "v", 0.4)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM e)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_sum(list_transform(list_zip(a.v, b.v), z -> z[1]*z[2])) / (a.nrm * b.nrm) AS cosine
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE list_sum(list_transform(list_zip(a.v, b.v), z -> z[1]*z[2])) / (a.nrm * b.nrm) >= 0.4
        ORDER BY id_a, id_b"""),
      "embedding-cosine near-dup pairs (threshold 0.4): LSH bucket candidate generation " +
        "(ids-only equi-join, no all-pairs) + exact re-score — precision 1 by construction, " +
        "recall 1.0 at this corpus/scale (tables=128, planes=8, verified vs the all-pairs oracle)"),

    // --------------------------------------------------- simhash near-dup
    Q("q31_simhash_pairs",
      (s, d) => {
        // spread the single-split scan: the 64-slot vote fold is per-row
        // expensive and must use every core
        val fp = T.documents(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(
            col("doc_id"),
            SimHash.simhash(TextOps.polyHashAll(docTokens)).as("fp"))
        SimHash.nearPairs(fp, "doc_id", "fp", maxHamming = 3)
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("hamming"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      // The 64-slot majority-vote fingerprint itself is not reasonably
      // ANSI-SQL-expressible, but the RESULT at the driver's gate scale
      // is deterministic, so the pair set is pinned as a literal
      // expected-set oracle (computed once by the LlmOpsSpec-tested
      // implementation on /root/testdata/sf0.01 — valid for that corpus
      // only; regenerate via Verify if the test data ever changes).
      Some("""
        SELECT CAST(c1 AS BIGINT) AS doc_a, CAST(c2 AS BIGINT) AS doc_b,
               CAST(c3 AS INTEGER) AS hamming
        FROM (VALUES
          (8, 245, 1),
          (45, 267, 2),
          (45, 413, 1),
          (58, 293, 3),
          (61, 185, 1),
          (70, 447, 1),
          (92, 450, 3),
          (98, 290, 1),
          (107, 387, 2),
          (152, 178, 3),
          (166, 323, 1),
          (251, 311, 3),
          (263, 311, 3),
          (267, 413, 1),
          (270, 465, 2),
          (285, 301, 1),
          (295, 374, 2),
          (393, 420, 1),
          (458, 462, 3)) t(c1, c2, c3)
        ORDER BY doc_a, doc_b"""),
      "simhash near-dup: 64-bit majority-vote fingerprint, pigeonhole 16-bit-chunk join " +
        "(hamming<=3 => one exact chunk match), exact hamming filter on candidates only. " +
        "Oracle = pinned expected pair set at the gate's sf0.01 corpus"),

    // ------------------------------------------------ multimodal columns
    Q("q32_multimodal_meta",
      (s, d) => {
        Multimodal.headerFeatures(Multimodal.pack(T.documents(s, d), "doc_id", "text"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
               CAST(length(text) % 1024 AS INTEGER) AS width,
               CAST(length(text) % 768 AS INTEGER) AS height,
               coalesce(TRY_CAST(('0x' || substr(hex(encode(text)), 1, 2)) AS INTEGER), 0) AS first_byte
        FROM documents ORDER BY doc_id"""),
      "multimodal plumbing: opaque binary payload + typed metadata struct, scan-side header " +
        "features. Batched decode stub lives in Multimodal.decodeFeatures (MultimodalSpec)"),

    // ------------------------------------- multimodal batched decode path
    Q("q44_multimodal_decode",
      (s, d) => {
        import s.implicits._
        val media = Multimodal.pack(T.documents(s, d), "doc_id", "text")
          .select(col("doc_id"), col("payload"), col("meta.format").as("format"),
            col("meta.width").as("width"), col("meta.height").as("height"))
          .as[Multimodal.MediaRow]
        Multimodal.decodeFeatures(s, media, s.sparkContext.defaultParallelism)
          .select(col("doc_id"), col("n_bytes"), col("mean_byte"))
          .orderBy(col("doc_id"))
      },
      // the decode runs through the partition-batched mapPartitions path;
      // byte sums are exact integers, the mean is one double division —
      // DuckDB reproduces both from the UTF-8 blob's hex pairs
      Some("""
        WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
                          octet_length(encode(text)) AS n FROM documents),
        s AS (SELECT doc_id, n,
                     CAST(coalesce(list_sum(list_transform(range(1, n + 1),
                       i -> CAST('0x' || substr(hx, (i-1)*2 + 1, 2) AS INTEGER))), 0) AS BIGINT) AS bsum
              FROM b)
        SELECT doc_id, CAST(n AS INTEGER) AS n_bytes,
               CASE WHEN n = 0 THEN CAST(0.0 AS DOUBLE)
                    ELSE CAST(bsum AS DOUBLE) / CAST(n AS DOUBLE) END AS mean_byte
        FROM s ORDER BY doc_id"""),
      "multimodal batched decode under the oracle gate: pack -> typed Dataset -> " +
        "partition-batched mapPartitions decode (the real codec shape; stub emits exact " +
        "byte stats) -> per-doc features. Exercises the one justified mapPartitions path"),

    // ------------------------------------------------ J5 fluent lateral
    Q("q35_lateral_fluent",
      (s, d) => {
        val n = T.nation(s, d).as("n")
        val rich = T.customer(s, d).as("c")
          .where(col("c.c_nationkey") === col("n.n_nationkey").outer() &&
            col("c.c_acctbal") > 9900)
          .select(col("c_custkey"), col("c_acctbal"))
        Lateral.leftOuter(n, rich)
          .select(col("n_name"), col("c_custkey"), col("c_acctbal"))
          .orderBy(col("n_name"), col("c_custkey"))
      },
      Some("""
        SELECT n_name, t.c_custkey, t.c_acctbal
        FROM nation LEFT JOIN LATERAL (
          SELECT c_custkey, c_acctbal FROM customer
          WHERE c_nationkey = n_nationkey AND c_acctbal > 9900) t ON TRUE
        ORDER BY n_name, c_custkey"""),
      "J5 fluent lateral join (Dataset.lateralJoin + outer() correlation, " +
        "LateralWithTableAPIJob.java:99-103); nations with no rich customer null-pad"),

    // ----------------------------------------------- corpus-level dedup
    Q("q34_neardup_dedup",
      (s, d) => {
        MinHash.dedupCorpus(T.documents(s, d), "doc_id", "text")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh FROM toks),
        drop AS (SELECT DISTINCT b.doc_id
                 FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                 WHERE len(a.sh) > 0 AND len(b.sh) > 0
                   AND len(list_intersect(a.sh, b.sh)) * 10 >=
                       8 * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))))
        SELECT doc_id, lang, n_chars FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM drop)
        ORDER BY doc_id"""),
      "corpus near-dup removal: keep-lowest-id survivor per verified pair; " +
        "survivors via anti join on dropped ids (doc payloads never enter the pair pipeline)"),

    // --------------------------------------- typed Aggregator (UDAF) stats
    Q("q39_corpus_moments",
      (s, d) => {
        val m = udaf(graft.functions.CorpusStats.tokenMoments)
        val base = T.documents(s, d)
          .select(col("lang"), TextOps.tokenCount(docTokens).as("ntok"))
          .groupBy(col("lang"))
          .agg(m(col("ntok")).as("mom"))
        base.select(
            col("lang"),
            col("mom.n").as("n_docs"),
            col("mom.sum").as("sum_tokens"),
            col("mom.sumSq").as("sum_sq_tokens"),
            (col("mom.sum").cast("double") / col("mom.n").cast("double")).as("mean_tokens"),
            ((col("mom.sumSq").cast("double") - col("mom.sum").cast("double") * col("mom.sum").cast("double") / col("mom.n").cast("double")) / col("mom.n").cast("double")).as("var_tokens"))
          .orderBy(col("lang"))
      },
      Some("""
        WITH t AS (SELECT lang, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS ntok FROM documents),
        m AS (SELECT lang, count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS sum_tokens,
                     CAST(sum(ntok*ntok) AS BIGINT) AS sum_sq_tokens
              FROM t GROUP BY lang)
        SELECT lang, n_docs, sum_tokens, sum_sq_tokens,
               CAST(sum_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_tokens,
               (CAST(sum_sq_tokens AS DOUBLE) - CAST(sum_tokens AS DOUBLE) * CAST(sum_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)) / CAST(n_docs AS DOUBLE) AS var_tokens
        FROM m ORDER BY lang"""),
      "custom typed Aggregator (UDAF, SURVEY §7.6): exact integer moments map-side, " +
        "mean/variance derived from exact sums in one deterministic double expression"),

    // ------------------------------------------ sketched distinct counts
    Q("q47_sketch_vocab",
      (s, d) => {
        // HLL++ sketch next to the exact count: at 100 TB the exact
        // distinct needs a two-level shuffle of every distinct token;
        // the sketch is a fixed-size register set, map-side mergeable,
        // one tiny shuffle. Deterministic: fixed hash, register-wise max
        // merge is order-independent — so the sketch value is pinnable.
        T.documents(s, d)
          .select(col("lang"), explode(docTokens).as("w"))
          .groupBy(col("lang"))
          .agg(
            countDistinct(col("w")).as("n_exact"),
            approx_count_distinct(col("w"), 0.02).as("n_approx"))
          .orderBy(col("lang"))
      },
      // hybrid oracle: the exact half is computed in SQL; the sketch half
      // is pinned (sf0.01 corpus — tiny 31-word synthetic vocabulary, so
      // the 2%-rsd sketch is exact here; re-pin if testdata changes)
      Some("""
        WITH t AS (SELECT lang, unnest(string_split(lower(text), ' ')) AS w FROM documents),
        exact AS (SELECT lang, count(DISTINCT w) AS n_exact FROM t GROUP BY lang),
        pinned AS (SELECT * FROM (VALUES
          ('de', 31), ('en', 31), ('es', 31), ('fr', 31), ('zh', 31)) p(lang, n_approx))
        SELECT exact.lang AS lang, CAST(n_exact AS BIGINT) AS n_exact,
               CAST(n_approx AS BIGINT) AS n_approx
        FROM exact JOIN pinned ON exact.lang = pinned.lang
        ORDER BY lang"""),
      "vocabulary size per language, exact (two-level distinct agg) next to the HLL++ " +
        "sketch (rsd 2%): the sketch is the 100 TB path — fixed-size mergeable registers, " +
        "no distinct shuffle; deterministic, so the oracle pins its value exactly"),

    // -------------------------------------- length-distribution quantiles
    Q("q46_length_quantiles",
      (s, d) => {
        T.registerAll(s, d)
        // discrete quantiles via explicit integer ranks (rank_p =
        // ceil(p*n) computed with integer division) — bit-exact across
        // engines, unlike interpolating percentile whose float rank
        // arithmetic can differ by ulps. One window sort per group: the
        // shape distributed exact quantiles need; at 100 TB switch to
        // approx_percentile (t-digest sketch, map-side mergeable) and
        // accept the documented error bound.
        s.sql("""
          WITH t AS (SELECT lang, CAST(size(split(lower(text), ' ')) AS BIGINT) AS ntok FROM documents),
          r AS (SELECT lang, ntok,
                       row_number() OVER (PARTITION BY lang ORDER BY ntok) AS rn,
                       count(*) OVER (PARTITION BY lang) AS n
                FROM t)
          SELECT lang, max(n) AS n_docs,
                 min(CASE WHEN rn = (n + 1) div 2 THEN ntok END) AS p50,
                 min(CASE WHEN rn = (n * 9 + 9) div 10 THEN ntok END) AS p90,
                 min(CASE WHEN rn = (n * 99 + 99) div 100 THEN ntok END) AS p99,
                 max(ntok) AS p100
          FROM r GROUP BY lang ORDER BY lang""")
      },
      Some("""
        WITH t AS (SELECT lang, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS ntok FROM documents),
        r AS (SELECT lang, ntok,
                     row_number() OVER (PARTITION BY lang ORDER BY ntok) AS rn,
                     count(*) OVER (PARTITION BY lang) AS n
              FROM t)
        SELECT lang, max(n) AS n_docs,
               min(CASE WHEN rn = (n + 1) // 2 THEN ntok END) AS p50,
               min(CASE WHEN rn = (n * 9 + 9) // 10 THEN ntok END) AS p90,
               min(CASE WHEN rn = (n * 99 + 99) // 100 THEN ntok END) AS p99,
               max(ntok) AS p100
        FROM r GROUP BY lang ORDER BY lang"""),
      "doc-length distribution per language: exact discrete p50/p90/p99 via integer " +
        "ranks (ceil(p*n) in integer division — no float rank ulps); the length-filter " +
        "thresholds a training-data pipeline derives. Scale path: approx_percentile sketch"),

    // ------------------------------------ deterministic train/val split
    Q("q45_train_split",
      (s, d) => {
        val split = when(TextOps.hashBucket(col("text"), 100) < 90, lit("train"))
          .otherwise(lit("val"))
        T.documents(s, d)
          .select(col("lang"), split.as("split"))
          .groupBy(col("lang"), col("split"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("lang"), col("split"))
      },
      Some("""
        WITH h AS (SELECT lang,
          CASE WHEN list_reduce(list_prepend(CAST(7 AS BIGINT),
                 list_transform(range(1, length(text)+1), i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
                 (a, c) -> (a*31 + c) % 1000000007) % 100 < 90
               THEN 'train' ELSE 'val' END AS split
          FROM documents)
        SELECT lang, split, count(*) AS n_docs
        FROM h GROUP BY lang, split ORDER BY lang, split"""),
      "deterministic train/val split: content-hash bucket (polyHash mod 100, 90/10) — " +
        "stable across runs/engines/cluster layouts unlike rand(); map-side assignment, " +
        "one count shuffle; the oracle reproduces the exact same assignment"),

    // ------------------------------------- exact Jaccard join (AllPairs)
    Q("q41_jaccard_join",
      (s, d) => {
        JaccardJoin.nearDupPairs(T.documents(s, d), "doc_id", "text", num = 6, den = 10)
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
            col("inter_size"), col("union_size"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""
        WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh FROM toks)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter_size,
               CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS union_size
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(a.sh) > 0 AND len(b.sh) > 0
          AND len(list_intersect(a.sh, b.sh)) * 10 >=
              6 * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
        ORDER BY doc_a, doc_b"""),
      "EXACT n-gram Jaccard join (threshold 0.6) via rarest-first prefix filtering " +
        "(AllPairs/PPJoin): guaranteed-complete unlike minhash-LSH; candidates from an " +
        "inverted-index equi-join of prefixes only, never all-pairs. Oracle all-pairs matches " +
        "EXACTLY because the filter is complete, not probabilistic"),

    // ----------------------------------------------------------- IVF ANN
    Q("q42_ann_ivf",
      (s, d) => {
        val e = T.embeddings(s, d).select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        Ivf.topK(e, e.where(col("vec_id") < 10), "vec_id", "v", k = 5, stride = 16, nprobe = 4)
          .select(col("probe_id"), col("rank"), col("neighbor_id"), col("cosine"))
          .orderBy(col("probe_id"), col("rank"))
      },
      // Deterministic (sampled centroids + one fixed-point Lloyd
      // refinement, fixed fold order): result at the gate's sf0.01 corpus
      // pinned as a literal expected-set oracle (doubles quoted as
      // strings — see q33). Stale-pin protection: PinnedCorpus guard.
      Some("""
        SELECT CAST(c1 AS BIGINT) AS probe_id, CAST(c2 AS INTEGER) AS rank,
               CAST(c3 AS BIGINT) AS neighbor_id, CAST(c4 AS DOUBLE) AS cosine
        FROM (VALUES
          (0, 1, 365, '0.3699935965460897'),
          (0, 2, 334, '0.3627220558741131'),
          (0, 3, 387, '0.33113871888314317'),
          (0, 4, 423, '0.2969335986409863'),
          (0, 5, 7, '0.29284215147436643'),
          (1, 1, 386, '0.37148454183744223'),
          (1, 2, 195, '0.32274442635213746'),
          (1, 3, 64, '0.3163742953318501'),
          (1, 4, 124, '0.30275028236602597'),
          (1, 5, 402, '0.2923219897446138'),
          (2, 1, 320, '0.25504277088103294'),
          (2, 2, 418, '0.25402949645206835'),
          (2, 3, 112, '0.24531081757260517'),
          (2, 4, 197, '0.23314916074606343'),
          (2, 5, 97, '0.22500902551884036'),
          (3, 1, 130, '0.39987234325628024'),
          (3, 2, 149, '0.3299339769519209'),
          (3, 3, 192, '0.290802917949569'),
          (3, 4, 437, '0.28053528594179866'),
          (3, 5, 396, '0.260964744503398'),
          (4, 1, 114, '0.39851269358433744'),
          (4, 2, 496, '0.34121178056570023'),
          (4, 3, 408, '0.32275312529105415'),
          (4, 4, 482, '0.31389702932135605'),
          (4, 5, 280, '0.27982608680315935'),
          (5, 1, 33, '0.3109867269549467'),
          (5, 2, 395, '0.2755988285521192'),
          (5, 3, 464, '0.2708818117150911'),
          (5, 4, 487, '0.2630433732893686'),
          (5, 5, 266, '0.26094401790649646'),
          (6, 1, 430, '0.32252026548071816'),
          (6, 2, 78, '0.20823917013691964'),
          (6, 3, 453, '0.20579270179662507'),
          (6, 4, 115, '0.2050854395975698'),
          (6, 5, 232, '0.20311375143962154'),
          (7, 1, 340, '0.4927657135003488'),
          (7, 2, 425, '0.4075199341921925'),
          (7, 3, 334, '0.3569014029689115'),
          (7, 4, 0, '0.29284215147436643'),
          (7, 5, 59, '0.27023582414155406'),
          (8, 1, 314, '0.25580287974774224'),
          (8, 2, 254, '0.24251541396861967'),
          (8, 3, 338, '0.2364453582878314'),
          (8, 4, 35, '0.2326091777698265'),
          (8, 5, 379, '0.2319659933877191'),
          (9, 1, 49, '0.38517053208433855'),
          (9, 2, 256, '0.2844743732954765'),
          (9, 3, 198, '0.2586758655955398'),
          (9, 4, 319, '0.24190310903970472'),
          (9, 5, 274, '0.23351579032180036')) t(c1, c2, c3, c4)
        ORDER BY probe_id, rank"""),
      "IVF-Flat ANN: deterministically sampled coarse centroids + one fixed-point Lloyd " +
        "refinement (order-independent integer mean accumulation), map-side argmax " +
        "assignment (broadcast NLJ + partial max agg — the index shuffle is n id rows), " +
        "nprobe-list candidate fetch + exact re-rank; reads ~nprobe/k of the corpus per probe"),

    // ------------------------------------------------------ filtered ANN
    Q("q171_ann_filtered",
      (s, d) => {
        // production vector search's metadata-predicate shape: nearest 5
        // with label = 2 (one of 10 labels, ~10% selectivity). The
        // predicate PRE-filters the candidate fetch inside the probed
        // lists — post-filtering an unfiltered top-k would return < k
        // rows whenever the unfiltered winners carry other labels.
        // refine = 0 (raw stride seeds) so the ENTIRE computation —
        // quantizer, assignment, probe lists, filtered fetch, exact
        // re-rank — replays in the oracle SQL, no pinning.
        val e = T.embeddings(s, d).select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"), col("label"))
        Ivf.topKWhere(e, e.where(col("vec_id") < 10), "vec_id", "v",
            pred = col("label") === 2, attrs = Seq("label"),
            k = 5, stride = 16, nprobe = 4, refine = 0)
          .select(col("probe_id"), col("rank"), col("neighbor_id"), col("cosine"))
          .orderBy(col("probe_id"), col("rank"))
      },
      // full replay, the q84/q165 device: stride seeds with the maxK=64
      // cap and the zero-norm drop; argmax assignment (ties -> larger
      // centroid id, the max(struct) rule); per-probe nprobe lists
      // (ties -> SMALLER centroid id, topKPruned's ascending tiebreak);
      // label filter on the fetched candidates; exact cosine re-rank
      // (ties -> smaller neighbor id). Exact double equality across
      // engines per the q30/q49 in-order-arithmetic precedent. Shared
      // VERBATIM with q178 (the same query through the PERSISTED
      // bucketed index) so the two oracles can never drift.
      Some(FilteredAnnTopkSql),
      "FILTERED IVF ANN (Ivf.topKWhere): metadata predicate pre-filters the candidate " +
        "fetch inside the probed lists (post-filter of an unfiltered top-k is NOT " +
        "equivalent), index built once on the full corpus with attr columns carried in; " +
        "on the persisted layout the predicate reaches the parquet scan as a pushed " +
        "row-group filter UNDER the centroid PartitionFilters prune"),

    // ----------------------------------------------------------- LSH ANN
    Q("q33_ann_lsh",
      (s, d) => {
        val e = T.embeddings(s, d).select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        Similarity.lshBucketTopK(e, e.where(col("vec_id") < 10), "vec_id", "v", k = 5)
          .select(col("probe_id"), col("rank"), col("neighbor_id"), col("cosine"))
          .orderBy(col("probe_id"), col("rank"))
      },
      // Approximate by design (never equals the exact top-k), but fully
      // deterministic: seeded hyperplanes + fixed fold order. The result
      // at the driver's gate scale is pinned as a literal expected-set
      // oracle (computed once on /root/testdata/sf0.01 by the
      // recall-tested implementation; doubles quoted as strings so DuckDB
      // parses them straight to the identical bits — a bare numeric
      // literal would round-trip through DECIMAL and lose ulps).
      Some("""
        SELECT CAST(c1 AS BIGINT) AS probe_id, CAST(c2 AS INTEGER) AS rank,
               CAST(c3 AS BIGINT) AS neighbor_id, CAST(c4 AS DOUBLE) AS cosine
        FROM (VALUES
          (0, 1, 334, '0.3627220558741131'),
          (0, 2, 73, '0.29543411523164853'),
          (0, 3, 271, '0.18709186068994138'),
          (0, 4, 351, '0.186405064239813'),
          (0, 5, 150, '0.16399368198553613'),
          (1, 1, 402, '0.2923219897446138'),
          (1, 2, 353, '0.2465920189390982'),
          (1, 3, 268, '0.24554155118580062'),
          (1, 4, 213, '0.22013514923429597'),
          (1, 5, 428, '0.1978321363900825'),
          (2, 1, 320, '0.25504277088103294'),
          (2, 2, 351, '0.17068497973959845'),
          (2, 3, 127, '0.16804662836972026'),
          (2, 4, 371, '0.16620851960455585'),
          (2, 5, 187, '0.1215481784230796'),
          (3, 1, 463, '0.2608734389395776'),
          (3, 2, 134, '0.2506007497083316'),
          (3, 3, 201, '0.23261095604093007'),
          (3, 4, 428, '0.21365582115726148'),
          (3, 5, 341, '0.20897048161070397'),
          (4, 1, 114, '0.39851269358433744'),
          (4, 2, 249, '0.2796306459978647'),
          (4, 3, 470, '0.2525366199686862'),
          (4, 4, 434, '0.20870624783799507'),
          (4, 5, 19, '0.1948320838966962'),
          (5, 1, 121, '0.19074388838363143'),
          (5, 2, 13, '0.09119789774456134'),
          (5, 3, 125, '0.06959208032276741'),
          (5, 4, 163, '0.057818924907651593'),
          (5, 5, 47, '0.028341807437781717'),
          (6, 1, 261, '0.13376424586020386'),
          (6, 2, 266, '0.1291447722427416'),
          (6, 3, 479, '0.10518092424658126'),
          (6, 4, 221, '0.10027339460304027'),
          (6, 5, 107, '0.0508468239940456'),
          (7, 1, 340, '0.4927657135003488'),
          (7, 2, 334, '0.3569014029689115'),
          (7, 3, 302, '0.31452389923524804'),
          (7, 4, 49, '0.2883516695773273'),
          (7, 5, 332, '0.2854464417580546'),
          (8, 1, 379, '0.2319659933877191'),
          (8, 2, 456, '0.1861146754154527'),
          (8, 3, 301, '0.1819490829322985'),
          (8, 4, 109, '0.15399487457125194'),
          (8, 5, 192, '0.12718260419706384'),
          (9, 1, 107, '0.2844935027707189'),
          (9, 2, 319, '0.24190310903970472'),
          (9, 3, 140, '0.1505721239792483'),
          (9, 4, 462, '0.12404371397187933'),
          (9, 5, 12, '0.11405591224975778')) t(c1, c2, c3, c4)
        ORDER BY probe_id, rank"""),
      "ANN scale path: random-hyperplane LSH buckets -> bucket join -> exact re-rank. " +
        "Shuffle O(n*tables) instead of O(n^2); candidates bounded per bucket"),

    // ------------------------------- end-to-end corpus curation pipeline
    Q("q48_curation_pipeline",
      (s, d) => {
        // the whole training-data curation flow as ONE declarative plan:
        // exact dedup (min-id survivor) -> language-ID + quality gate ->
        // deterministic content-hash train/val split -> per-(lang, split)
        // counts. Catalyst earns its keep here: min(doc_id) is eliminated
        // (unused downstream, so dedup collapses to a keys-only hash agg),
        // the scan reads ONLY `text` with the token-count filter pushed
        // into it, and all map stages (language scores, quality, split)
        // fuse into one codegen stage. Two data shuffles (dedup by text
        // hash, count agg) plus the output sort's range exchange.
        val surv = T.documents(s, d)
          .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
        val (_, pred) = TextOps.languageId(TextOps.tokens(col("text")), LangMarkers)
        val qp = TextOps.qualityScore(col("text"))
        surv
          .select(col("text"), pred.as("pred_lang"),
            qp.nTokens.as("__nt"), qp.quality.as("__q"))
          .where(col("__nt") >= 5 && col("__q") >= 0.5)
          .select(col("pred_lang"),
            when(TextOps.hashBucket(col("text"), 100) < 90, lit("train"))
              .otherwise(lit("val")).as("split"))
          .groupBy(col("pred_lang"), col("split"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("pred_lang"), col("split"))
      },
      Some {
        // composed verbatim from the q22/q26/q27/q45 oracle pieces — each
        // stage's bit-exactness is independently gate-proven
        val stop = TextOps.Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
        val scoreExprs = LangMarkers.map { case (lang, words) =>
          val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
          s"CAST(len(list_filter(w, x -> list_contains($lst, x))) AS BIGINT) AS score_$lang"
        }.mkString(",\n               ")
        val langs = LangMarkers.map(_._1)
        val cases = langs.init.zipWithIndex.map { case (l, i) =>
          val conds = langs.drop(i + 1).map(o => s"score_$l >= score_$o").mkString(" AND ")
          s"WHEN $conds THEN '$l'"
        }.mkString("\n                    ")
        s"""
        WITH surv AS (SELECT text, min(doc_id) AS doc_id FROM documents GROUP BY text),
        t AS (SELECT text, string_split(lower(text), ' ') AS w FROM surv),
        m AS (SELECT text, w,
               CAST(len(w) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(w, x -> list_contains($stop, x))) AS BIGINT) AS n_stop,
               CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS sum_wlen,
               $scoreExprs
        FROM t),
        q AS (SELECT text, n_tokens,
               least(CAST(n_tokens AS DOUBLE) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.5 AS DOUBLE)
                 + (CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * CAST(0.2 AS DOUBLE)
                 + (CAST(sum_wlen AS DOUBLE) / CAST(n_tokens AS DOUBLE)) / CAST(10.0 AS DOUBLE) * CAST(0.3 AS DOUBLE) AS quality,
               CASE $cases
                    ELSE '${langs.last}' END AS pred_lang
        FROM m),
        k AS (SELECT text, pred_lang FROM q WHERE n_tokens >= 5 AND quality >= CAST(0.5 AS DOUBLE)),
        h AS (SELECT pred_lang,
               CASE WHEN list_reduce(list_prepend(CAST(7 AS BIGINT),
                      list_transform(range(1, length(text)+1), i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
                      (a, c) -> (a*31 + c) % 1000000007) % 100 < 90
                    THEN 'train' ELSE 'val' END AS split
        FROM k)
        SELECT pred_lang, split, count(*) AS n_docs
        FROM h GROUP BY pred_lang, split ORDER BY pred_lang, split"""
      },
      "end-to-end corpus curation in one plan: exact dedup -> language-ID + quality gate " +
        "-> deterministic content-hash 90/10 split -> counts. Two shuffles total (dedup by " +
        "text hash, final agg); every map stage fused into the scan by Catalyst. Oracle " +
        "composes the gate-proven q22/q26/q27/q45 pieces verbatim"),

    // --------------------------------------- embedding-cosine corpus dedup
    Q("q49_embedding_dedup",
      (s, d) => {
        val e = T.embeddings(s, d).select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        Similarity.dedupCorpus(e, "vec_id", "v", 0.4)
          .select(col("vec_id"))
          .orderBy(col("vec_id"))
      },
      // oracle: survivors = ids never appearing as the HIGHER id of a
      // qualifying all-pairs pair (q30's pair oracle + anti-join). The
      // LSH path's recall is 1.0 on this corpus (q30 hash-matches the
      // all-pairs oracle), so the dedup sets agree exactly
      Some("""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM e),
        drop AS (SELECT DISTINCT b.vec_id
                 FROM n a JOIN n b ON a.vec_id < b.vec_id
                 WHERE list_sum(list_transform(list_zip(a.v, b.v), z -> z[1]*z[2])) / (a.nrm * b.nrm) >= 0.4)
        SELECT vec_id FROM e WHERE vec_id NOT IN (SELECT vec_id FROM drop)
        ORDER BY vec_id"""),
      "embedding-cosine corpus dedup (threshold 0.4): LSH candidate pairs -> exact verify " +
        "-> keep-lowest-id anti-join. Completes the dedup family's embedding column: pairs " +
        "(q30) and corpus-level removal (this) share the bucketed no-all-pairs pipeline"),

    // ------------------------------------------------ simhash corpus dedup
    Q("q50_simhash_dedup",
      (s, d) => {
        val fp = T.documents(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(
            col("doc_id"),
            SimHash.simhash(TextOps.polyHashAll(docTokens)).as("fp"))
        SimHash.dedupCorpus(fp, "doc_id", "fp", maxHamming = 3)
          .select(col("doc_id"))
          .orderBy(col("doc_id"))
      },
      // oracle: survivors = doc_ids never appearing as the HIGHER id of a
      // q31 pair — the drop rule composed over q31's pinned pair set (the
      // 17 distinct doc_b values below; same corpus-validity caveat, same
      // PinnedCorpus guard).
      Some("""
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (178, 185, 245, 267, 290, 293, 301, 311, 323,
                             374, 387, 413, 420, 447, 450, 462, 465)
        ORDER BY doc_id"""),
      "simhash corpus dedup (hamming<=3): pigeonhole pair generation -> keep-lowest-id " +
        "anti-join. Completes corpus-level removal for every near-dup family: minhash " +
        "(q34), exact Jaccard, embedding cosine (q49), and simhash (this)"),

    // ----------------------------------- cluster-canonical corpus dedup
    Q("q51_cluster_dedup",
      (s, d) => {
        JaccardJoin.dedupCorpusClustered(T.documents(s, d), "doc_id", "text", num = 6, den = 10)
          .select(col("doc_id"))
          .orderBy(col("doc_id"))
      },
      // oracle: q41's exact all-pairs pair graph, components by
      // transitive closure (recursive CTE), keep the min id per
      // component — fully SQL-derived, no pinning
      Some("""
        WITH RECURSIVE toks AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh FROM toks),
        pairs AS (SELECT a.doc_id AS pa, b.doc_id AS pb
                  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                  WHERE len(a.sh) > 0 AND len(b.sh) > 0
                    AND len(list_intersect(a.sh, b.sh)) * 10 >=
                        6 * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))),
        edges AS (SELECT pa AS u, pb AS v FROM pairs UNION SELECT pb, pa FROM pairs),
        reach(id, r) AS (
          SELECT u, u FROM edges
          UNION
          SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v),
        comp AS (SELECT id, min(r) AS c FROM reach GROUP BY id)
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> c)
        ORDER BY doc_id"""),
      "cluster-canonical dedup: exact Jaccard pair graph -> distributed connected " +
        "components (min-label propagation + pointer jumping, O(log n) ids-only join " +
        "rounds) -> keep the min-id doc per cluster. Transitive, one survivor per " +
        "near-dup cluster — the policy production corpus pipelines use; greedy q-style " +
        "drop-higher-id (q34/q49/q50) can keep several docs of one cluster"),

    // --------------------------------------- test-set decontamination
    Q("q52_decontaminate",
      (s, d) => {
        // benchmark = every 20th doc (the held-out eval set), corpus = the
        // rest; drop corpus docs sharing any word 5-gram with the benchmark
        val docs = T.documents(s, d)
        val corpus = docs.where(pmod(col("doc_id"), lit(20L)) =!= 0)
        val benchmark = docs.where(pmod(col("doc_id"), lit(20L)) === 0)
        Decontaminate.clean(corpus, benchmark, "doc_id", "text", ngram = 5)
          .select(col("doc_id"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        g AS (SELECT doc_id, unnest(list_transform(range(1, len(w)-3),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS gram
              FROM t),
        bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0),
        hit AS (SELECT DISTINCT g.doc_id FROM g JOIN bg USING (gram) WHERE g.doc_id % 20 <> 0)
        SELECT doc_id FROM documents
        WHERE doc_id % 20 <> 0 AND doc_id NOT IN (SELECT doc_id FROM hit)
        ORDER BY doc_id"""),
      "test-set decontamination (GPT-3-style n-gram collision, n=5): benchmark n-grams " +
        "-> distinct banlist -> one exact string semi-join against the exploded corpus " +
        "-> anti-join the contaminated ids. Banlist is benchmark-sized (broadcastable); " +
        "ids-only contamination set; no hashing, so zero false drops"),

    // ------------------------------------------------- per-source caps
    Q("q53_source_cap",
      (s, d) => {
        // cap each source at 10 docs, chosen by deterministic hash
        // priority (NOT head-of-table: that biases toward old/low-id docs;
        // NOT rand(): irreproducible). Priority = (id * Knuth-multiplier)
        // mod 1e9+7 — engine-independent integer arithmetic, doc_id
        // tiebreak makes the order total. The rn<=k filter compiles to
        // WindowGroupLimit: each map task keeps only its local top-k per
        // source BEFORE the shuffle, so the exchange carries O(sources*k)
        // rows per task, not the corpus — the same plan shape PlanSpec
        // pins for keep-latest dedup.
        val pr = pmod(col("doc_id") * lit(2654435761L), lit(1000000007L))
        T.documents(s, d)
          .withColumn("__rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("source")).orderBy(pr.asc, col("doc_id").asc)))
          .where(col("__rn") <= 10)
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id, source FROM (
          SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                   ORDER BY (doc_id * 2654435761) % 1000000007, doc_id) AS rn
          FROM documents)
        WHERE rn <= 10 ORDER BY doc_id"""),
      "per-source document cap (the per-domain cap stage of web-corpus curation): " +
        "deterministic hash-priority top-10 per source via WindowGroupLimit — map-side " +
        "group limit before the one shuffle by source; reproducible across runs/engines, " +
        "unlike rand() sampling"),

    // -------------------------------------- repetition quality filter
    Q("q54_repetition_filter",
      (s, d) => {
        // Gopher-style repetition criterion: a doc whose duplicate-bigram
        // fraction exceeds 10% is boilerplate/spam-suspect. Integer-exact
        // flag: dup_frac > 0.1  <=>  distinct2 * 10 < total2 * 9. All
        // map-side (native shingle expression in the scan stage); one agg
        // shuffle by source.
        val toks = TextOps.tokens(col("text"))
        T.documents(s, d)
          .select(col("source"),
            greatest(size(toks) - 1, lit(0)).cast("long").as("__tot"),
            size(TextOps.shingles(toks, 2)).cast("long").as("__d2"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("__d2") * 10 < col("__tot") * 9, 1L).otherwise(0L)).as("n_flagged"),
            sum(col("__tot")).as("total_bigrams"),
            sum(col("__d2")).as("distinct_bigrams"))
          .orderBy(col("source"))
      },
      Some("""
        WITH t AS (SELECT source, string_split(lower(text), ' ') AS w FROM documents),
        m AS (SELECT source,
               CAST(greatest(len(w)-1, 0) AS BIGINT) AS tot,
               CAST(len(list_distinct(list_transform(range(1, len(w)),
                 i -> w[i] || ' ' || w[i+1]))) AS BIGINT) AS d2
              FROM t)
        SELECT source, count(*) AS n_docs,
               CAST(sum(CASE WHEN d2*10 < tot*9 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
               CAST(sum(tot) AS BIGINT) AS total_bigrams,
               CAST(sum(d2) AS BIGINT) AS distinct_bigrams
        FROM m GROUP BY source ORDER BY source"""),
      "Gopher-style repetition filter: duplicate-bigram fraction per doc (integer-exact " +
        "flag: distinct*10 < total*9 <=> dup_frac > 0.1), aggregated per source. " +
        "Scan-side native shingles, one agg shuffle — the map-only quality-gate shape"),

    // -------------------------------- cross-doc repeated-passage report
    Q("q55_shared_passages",
      (s, d) => {
        // cross-document repeated passages: an 8-gram present in >= 2
        // docs is shared boilerplate (headers, licenses, templates) — the
        // practical stand-in for suffix-array substring dedup (Lee et al.,
        // "Deduplicating Training Data Makes Language Models Better")
        // when a distributed suffix array is not worth building. Grams
        // are DISTINCT per doc (native shingle expr), so count(*) per
        // gram IS its document frequency. Complements q54: that flags
        // intra-doc repetition, this flags text repeated ACROSS docs.
        // Two shuffles: df agg by gram (AQE splits hot boilerplate
        // grams), per-doc agg; flagged when shared fraction > 1/2,
        // integer-exact.
        // persisted: feeds the df agg AND the join probe side — without
        // it the scan+shingle stage runs twice. NOT a count-over-window:
        // that computes df in one shuffle, but WindowExec BUFFERS each
        // gram partition, and a real boilerplate gram (license header in
        // 1% of a web corpus) is a partition that fits no executor; the
        // agg+join streams the hot gram's probe rows and AQE can split
        // them.
        val sh = T.documents(s, d)
          .select(col("doc_id"), explode(TextOps.shingles(docTokens, 8)).as("__g"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val dfreq = sh.groupBy(col("__g")).agg(count(lit(1)).as("__df"))
        sh.join(dfreq, Seq("__g"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("__df") >= 2, 1L).otherwise(0L)).as("n_shared"))
          .select(col("doc_id"), col("n_grams"), col("n_shared"),
            when(col("n_shared") * 2 > col("n_grams"), 1L).otherwise(0L).as("flagged"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w)-6),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
                      w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]))) AS g
               FROM t),
        df AS (SELECT g, count(*) AS df FROM sh GROUP BY g)
        SELECT doc_id, count(*) AS n_grams,
               CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
               CAST(CASE WHEN sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 2 > count(*)
                    THEN 1 ELSE 0 END AS BIGINT) AS flagged
        FROM sh JOIN df USING (g)
        GROUP BY doc_id ORDER BY doc_id"""),
      "cross-document repeated-passage detection (8-gram document frequency >= 2): the " +
        "scalable stand-in for suffix-array substring dedup — per-doc shared-gram counts, " +
        "integer-exact majority flag. Distinct from q54 (intra-doc repetition) and " +
        "near-dup joins (whole-doc similarity): catches shared boilerplate in otherwise " +
        "unique docs"),

    // ---------------------------------- per-label embedding centroids
    Q("q56_label_centroids",
      (s, d) => {
        // per-class embedding centroid — the monitoring/EDA stage of an
        // embedding pipeline (class drift, cluster purity). Doubles sum
        // in nondeterministic order under parallel agg, so the mean is
        // accumulated FIXED-POINT: floor(x * 2^20) per element summed as
        // BIGINT (exact, order-independent — same device as the IVF
        // Lloyd pass), divided back out only in the final projection.
        // posexplode is scan-side; one agg shuffle by (label, dim).
        T.embeddings(s, d)
          .select(col("label"),
            posexplode(col("embedding").cast("array<double>")).as(Seq("__p", "__x")))
          .select(col("label"), (col("__p") + 1).cast("long").as("dim"),
            floor(col("__x") * 1048576).as("__fp"))
          .groupBy(col("label"), col("dim"))
          .agg(count(lit(1)).as("n_vecs"), sum(col("__fp")).as("sum_fp"))
          .select(col("label"), col("dim"), col("n_vecs"), col("sum_fp"),
            (col("sum_fp").cast("double") / (lit(1048576.0) * col("n_vecs"))).as("centroid"))
          .orderBy(col("label"), col("dim"))
      },
      Some("""
        SELECT label, i AS dim, count(*) AS n_vecs,
               CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT)) AS BIGINT) AS sum_fp,
               CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT)) AS DOUBLE)
                 / (1048576.0 * count(*)) AS centroid
        FROM embeddings, range(1, 65) t(i)
        GROUP BY label, i ORDER BY label, dim"""),
      "per-label embedding centroids with ORDER-INDEPENDENT exact accumulation: " +
        "fixed-point floor(x*2^20) summed as BIGINT (parallel double sums are " +
        "nondeterministic; integer sums are not), mean recovered in the final " +
        "projection. The class-drift/cluster-purity monitoring stage")
  )

  /** q171's full filtered-ANN DuckDB replay — stride-16 seeds, argmax
    * assignment, nprobe-4 probe lists, label = 2 pre-filtered fetch,
    * exact cosine top-5. Shared verbatim by q171 (the in-memory
    * [[graft.operators.Ivf.topKWhere]]) and q178 (the identical query
    * through a PERSISTED `_CP`-bucketed [[graft.operators.Ivf.writeIndex]]
    * tree): one oracle, two engine paths — the layout-invariance law at
    * the driver's hash-match gate.
    */
  private[graft] def FilteredAnnTopkSql: String = """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
        n AS (SELECT vec_id, v, label,
                     sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM e),
        c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n
              WHERE vec_id % 16 = 0 AND vec_id < 1024 AND nrm > 0),
        a AS (SELECT vec_id, cid,
                list_sum(list_transform(list_zip(v, cv), z -> z[1]*z[2])) / (nrm * cn) AS cc
              FROM n CROSS JOIN c
              WHERE nrm > 0
              QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cid DESC) = 1),
        p AS (SELECT vec_id AS pid, v AS pv, nrm AS pn FROM n
              WHERE vec_id < 10 AND nrm > 0),
        pl AS (SELECT pid, cid FROM (
                SELECT p.pid, c.cid,
                       list_sum(list_transform(list_zip(p.pv, c.cv), z -> z[1]*z[2]))
                         / (p.pn * c.cn) AS ccos
                FROM p CROSS JOIN c
                QUALIFY row_number() OVER (PARTITION BY p.pid
                  ORDER BY ccos DESC, c.cid ASC) <= 4)),
        r AS (SELECT pl.pid, a.vec_id,
                list_sum(list_transform(list_zip(p.pv, nn.v), z -> z[1]*z[2]))
                  / (p.pn * nn.nrm) AS cosine
              FROM pl JOIN a ON a.cid = pl.cid
              JOIN n nn ON nn.vec_id = a.vec_id
              JOIN p ON p.pid = pl.pid
              WHERE a.vec_id <> pl.pid AND nn.label = 2 AND nn.nrm > 0)
        SELECT pid AS probe_id,
               CAST(row_number() OVER (PARTITION BY pid
                 ORDER BY cosine DESC, vec_id ASC) AS INTEGER) AS rank,
               vec_id AS neighbor_id, cosine
        FROM r
        QUALIFY rank <= 5
        ORDER BY probe_id, rank"""
}

/** Guard for the literal pinned oracles (q31 simhash, q33 LSH ANN,
  * q42 IVF, q47's sketch half, q50's drop set): those VALUES lists were computed from
  * ONE specific corpus, so the gate must refuse to compare them against
  * any other — a silent testdata/seed change would otherwise surface as
  * a baffling hash mismatch instead of "your pins are stale".
  *
  * Fingerprint = (row count, bit_xor of xxhash64(id, payload)) per
  * table: order-independent (XOR), overflow-free (no ANSI sum trap),
  * deterministic across runs/partitionings/clusters.
  */
object PinnedCorpus {

  /** Fingerprints of /root/testdata/sf0.01 at pin time. Regenerating
    * testdata invalidates these AND every pinned VALUES oracle:
    * recompute both via [[fingerprints]] + a fresh Verify run.
    */
  val DocumentsFp: (Long, Long) = (500L, -5517124391411150572L)
  val EmbeddingsFp: (Long, Long) = (500L, 8896384913969029791L)

  def fingerprints(spark: SparkSession, sfDir: String): ((Long, Long), (Long, Long)) = {
    def fp(df: DataFrame, cols: Column*): (Long, Long) = {
      val r = df.agg(count(lit(1)).as("n"), bit_xor(xxhash64(cols: _*)).as("x")).head()
      (r.getLong(0), r.getLong(1))
    }
    (fp(Tables.documents(spark, sfDir), col("doc_id"), col("text")),
      fp(Tables.embeddings(spark, sfDir), col("vec_id"), col("embedding")))
  }

  /** Fail loudly when `sfDir` is not the corpus the pins were computed
    * from. Called by Verify before dumping oracle SQL.
    */
  def assertMatches(spark: SparkSession, sfDir: String): Unit = {
    val (docs, embs) = fingerprints(spark, sfDir)
    require(docs == DocumentsFp && embs == EmbeddingsFp,
      s"corpus fingerprint mismatch: $sfDir has documents=$docs embeddings=$embs, " +
        s"but the pinned literal oracles (q31/q33/q42/q47/q50) were computed for " +
        s"documents=$DocumentsFp embeddings=$EmbeddingsFp. The testdata, seeds or hash " +
        "constants changed — regenerate the pinned VALUES oracles in LlmQueries " +
        "and update PinnedCorpus before trusting the gate.")
    // The events timestamp parquet ENCODING has drifted between testdata
    // generations before (round 5: NANOS -> MICROS-NTZ, killing 19
    // queries mid-round). Tables.events normalizes the known encodings;
    // an unknown third one must fail HERE with a named cause, not deep
    // inside 19 queries' analysis.
    val tsType = Tables.events(spark, sfDir).schema("ts").dataType
    require(tsType == org.apache.spark.sql.types.TimestampType,
      s"events.ts loaded as $tsType, expected TIMESTAMP: the testdata generator " +
        "changed the events timestamp encoding again — teach Tables.events the new " +
        "encoding (and extend FixtureSpec's dual-encoding test) before trusting the gate.")
  }
}
