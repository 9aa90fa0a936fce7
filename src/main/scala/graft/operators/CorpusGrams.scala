package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared per-doc gram-count frame of the curation family — q158's
  * repetition rules, q162's waterfall, q163's LM bigrams, and the
  * streaming [[graft.streaming.CurationGate]] all consume the same
  * (key…, k, gram, count) rows: both gram sizes (word bigrams AND
  * trigrams) counted inside each doc row in ONE corpus pass — zero
  * shuffles. The k=2 grams double as a bigram LM's training/scoring
  * pairs (the gram string splits back to (w1, w2) exactly — space-joined
  * space-free tokens round-trip).
  *
  * Storage switch (the [[MinHash.writeCorpusIndex]] device, here for the
  * gram frame): [[counts]] is the in-process shape — at gate scale a
  * caller persists it and every stage reads the cache; at production
  * scale the frame is corpus-sized and re-derivation (or caching) is the
  * wrong trade, so [[countsStored]] writes the counted frame as parquet
  * ONCE and every downstream stage — and the NEXT run — scans the
  * written index instead of re-exploding the corpus. Both paths are
  * hash-identical by construction (deterministic counts; pinned by a
  * regression test).
  */
object CorpusGrams {

  /** (keyCols…, k, g, c): per-doc word-bigram and -trigram counts,
    * ENTIRELY MAP-SIDE — both gram sizes counted inside each row by the
    * native [[graft.functions.HashExprs.GramRunCounts]] expression, then
    * exploded. No shuffle at all: the former corpus-sized
    * explode → groupBy(key, k, g) shuffled every gram OCCURRENCE; this
    * emits the identical (key, k, g, c) rows while the scan streams,
    * which is the difference between a ~token-count-sized exchange and
    * none at 100 TB. Callers that explode-amplify a single input split
    * can still `repartition` `docs` first (at 100 TB the same knob is
    * files.maxPartitionBytes sized for post-explosion volume).
    *
    * PRECONDITION: `keyCols` identify each input ROW (one row per doc —
    * true of every caller); counts are per-row, so duplicate keys would
    * yield duplicate (not summed) gram rows.
    */
  def counts(docs: DataFrame, keyCols: Seq[String], textCol: String): DataFrame =
    docs
      .select(keyCols.map(col) :+ TextOps.tokens(col(textCol)).as("__w"): _*)
      .select(keyCols.map(col) :+ explode(concat(
        transform(TextOps.gramCounts(col("__w"), 2),
          e => struct(lit(2L).as("k"), e.getField("g").as("g"), e.getField("c").as("c"))),
        transform(TextOps.gramCounts(col("__w"), 3),
          e => struct(lit(3L).as("k"), e.getField("g").as("g"), e.getField("c").as("c"))))).as("kgc"): _*)
      .select(keyCols.map(col) ++ Seq(col("kgc.k").as("k"), col("kgc.g").as("g"), col("kgc.c").as("c")): _*)

  /** [[counts]] materialized as a reusable parquet index at `path`
    * (overwrite), returned as the re-read frame — downstream stages scan
    * the written files, never the explosion lineage.
    */
  def countsStored(docs: DataFrame, keyCols: Seq[String], textCol: String,
      path: String): DataFrame = {
    counts(docs, keyCols, textCol).write.mode("overwrite").parquet(path)
    docs.sparkSession.read.parquet(path)
  }
}
