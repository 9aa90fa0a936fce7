package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators._

/** Round-5 training-data curation queries: the corpus-shaping stages a
  * pretraining pipeline runs AFTER dedup/filtering — decontamination at
  * banlist scale (bloom pre-filter), trajectory assembly, sequence
  * packing, mixture rebalancing, and per-domain keyword surfacing.
  *
  * Same oracle-exactness conventions as [[LlmQueries]]: integer/decimal
  * arithmetic end-to-end, deterministic row sets (unique tiebreakers),
  * explicit ORDER BY in both engines.
  */
object PipelineQueries {

  private def T = Tables

  private val docTokens = TextOps.tokens(col("text"))

  val all: Seq[Q] = Seq(

    // --------------------------------- bloom-prefiltered decontamination
    Q("q57_bloom_decontaminate",
      (s, d) => {
        // benchmark = every 25th doc, 4-gram collision — same stage as
        // q52 but through the bloom pre-filter path (the shape that
        // stops shuffling the corpus n-gram explosion when the banlist
        // outgrows broadcast). Oracle is the PLAIN anti-join: passing
        // proves the bloom path is exact, not just fast.
        val docs = T.documents(s, d)
        val corpus = docs.where(pmod(col("doc_id"), lit(25L)) =!= 0)
        val benchmark = docs.where(pmod(col("doc_id"), lit(25L)) === 0)
        Decontaminate.cleanBloom(corpus, benchmark, "doc_id", "text", ngram = 4)
          .select(col("doc_id"), col("lang"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        g AS (SELECT doc_id, unnest(list_transform(range(1, len(w)-2),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS gram
              FROM t),
        bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 25 = 0),
        hit AS (SELECT DISTINCT g.doc_id FROM g JOIN bg USING (gram) WHERE g.doc_id % 25 <> 0)
        SELECT doc_id, lang FROM documents
        WHERE doc_id % 25 <> 0 AND doc_id NOT IN (SELECT doc_id FROM hit)
        ORDER BY doc_id"""),
      "bloom-prefiltered decontamination: banlist bitmap (16 bits/gram) probes the " +
        "corpus n-gram explosion scan-side in a codegen'd native expression; only " +
        "collisions + ~0.04% false positives reach the exact string semi-join. No " +
        "false negatives by construction -> result equals the plain anti-join, which " +
        "is exactly what the oracle checks"),

    // ----------------------------------------- per-user event trajectories
    Q("q58_event_sequences",
      (s, d) => {
        // SFT-trajectory assembly: each user's events as one ordered
        // path string (first 40 hops). collect_list is unordered by
        // contract — array_sort on (ts, event_id, ...) restores a TOTAL
        // deterministic order (event_id is unique, so ties can't float).
        // One shuffle (groupBy user); per-user state is bounded by the
        // slice, the 100 TB shape for session/trajectory building
        val path = array_join(
          slice(
            transform(
              array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
              x => x.getField("event_type")),
            1, 40),
          ">")
        T.events(s, d)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"), path.as("path"))
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id, count(*) AS n_events,
               array_to_string(list_slice(list(event_type ORDER BY ts, event_id), 1, 40), '>') AS path
        FROM events GROUP BY user_id ORDER BY user_id"""),
      "per-user event trajectories: deterministic ordered concat (sort inside the agg " +
        "buffer, unique event_id tiebreak), capped at 40 hops — the session/trajectory " +
        "assembly stage of behavioral training data; one groupBy shuffle, payload " +
        "bounded by the cap"),

    // ------------------------------------------------- sequence packing
    Q("q59_token_packing",
      (s, d) => {
        // GPT-style concat-then-chunk packing bookkeeping: docs stream
        // in id order per source, pack = floor(start_offset / ctx) with
        // ctx = 256 tokens. All-integer window cumsum -> exact across
        // engines. Scale note: the prefix sum serializes per source —
        // at 100 TB pack within bounded shards (source, hash-bucket) so
        // no single window partition exceeds a task
        val ctx = 256
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        T.documents(s, d)
          .select(col("source"), col("doc_id"),
            TextOps.tokenCount(docTokens).as("ntok"))
          .withColumn("start_off", coalesce(sum(col("ntok")).over(w), lit(0L)))
          .withColumn("pack_id", expr(s"start_off div $ctx"))
          .groupBy(col("source"), col("pack_id"))
          .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"),
            min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
          .orderBy(col("source"), col("pack_id"))
      },
      Some("""
        WITH t AS (SELECT source, doc_id, len(string_split(lower(text), ' ')) AS ntok FROM documents),
        o AS (SELECT source, doc_id, ntok,
                CAST(coalesce(sum(ntok) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
              FROM t)
        SELECT source, start_off // 256 AS pack_id, count(*) AS n_docs,
               CAST(sum(ntok) AS BIGINT) AS n_tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM o GROUP BY 1, 2 ORDER BY 1, 2"""),
      "sequence packing: concat-then-chunk assignment (pack = start_offset div ctx) " +
        "via an integer window prefix-sum — the batch-assembly bookkeeping before " +
        "tokenized docs are written into fixed-length training rows"),

    // -------------------------------------------- stratified downsampling
    Q("q60_stratified_sample",
      (s, d) => {
        // mixture rebalancing: keep 40% of the dominant language (en),
        // 95% of the rest — assignment by CONTENT hash bucket (stable
        // across runs/engines/layouts; duplicate texts keep or drop
        // together, unlike rand() or per-row ids). Same mechanism q45
        // proves for train/val splits, parameterized per stratum
        val pct = when(col("lang") === "en", lit(40)).otherwise(lit(95))
        val kept = (TextOps.hashBucket(col("text"), 100) < pct).cast("long")
        T.documents(s, d)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_total"), sum(kept).as("n_kept"))
          .orderBy(col("lang"))
      },
      Some("""
        WITH h AS (SELECT lang,
            list_reduce(list_prepend(CAST(7 AS BIGINT),
              list_transform(range(1, length(text)+1), i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
              (a, c) -> (a*31 + c) % 1000000007) % 100 AS bucket
          FROM documents)
        SELECT lang, count(*) AS n_total,
               count(*) FILTER (bucket < CASE lang WHEN 'en' THEN 40 ELSE 95 END) AS n_kept
        FROM h GROUP BY lang ORDER BY lang"""),
      "stratified corpus downsampling: per-language keep fractions assigned by " +
        "content-hash bucket — deterministic, engine-reproducible mixture control " +
        "(the data-mix rebalancing stage); map-side assignment, one count shuffle"),

    // --------------------------------------------- distinctive terms (tf/df)
    Q("q61_distinctive_terms",
      (s, d) => {
        // per-language keyword surfacing, integer-exact: score = doc-freq
        // within the language scaled against corpus doc-freq via integer
        // division (tf*1e6 div df) — no float idf, so the ranking is
        // bit-reproducible in any engine. Two aggs + one join on term
        // (df table is vocabulary-sized -> broadcast at any corpus scale)
        val perDoc = T.documents(s, d)
          .select(col("lang"), col("doc_id"),
            explode(array_distinct(docTokens)).as("term"))
        val tfLang = perDoc.groupBy(col("lang"), col("term")).agg(count(lit(1)).as("tf"))
        val dfAll = perDoc.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val rk = row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("score").desc, col("term")))
        tfLang.join(dfAll, Seq("term"))
          .withColumn("score", expr("tf * 1000000 div df"))
          .withColumn("rank", rk)
          .where(col("rank") <= 5)
          .select(col("lang"), col("rank").cast("long").as("rank"),
            col("term"), col("tf"), col("df"), col("score"))
          .orderBy(col("lang"), col("rank"))
      },
      Some("""
        WITH t AS (SELECT lang, doc_id,
                     unnest(list_distinct(string_split(lower(text), ' '))) AS term
                   FROM documents),
        tf AS (SELECT lang, term, count(*) AS tf FROM t GROUP BY 1, 2),
        df AS (SELECT term, count(*) AS df FROM t GROUP BY 1),
        s AS (SELECT lang, term, tf, df, tf * 1000000 // df AS score FROM tf JOIN df USING (term)),
        r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY score DESC, term) AS rank FROM s)
        SELECT lang, rank, term, tf, df, score FROM r WHERE rank <= 5 ORDER BY lang, rank"""),
      "distinctive terms per language: integer tf/df scoring (tf*1e6 div df), top-5 " +
        "by (score desc, term) — keyword extraction / domain profiling with a " +
        "bit-reproducible ranking; the df side is vocabulary-sized (broadcastable)"))
}
