package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared per-doc gram-count frame of the curation family — q158's
  * repetition rules, q162's waterfall, q163's LM bigrams, and the
  * streaming [[graft.streaming.CurationGate]] all consume the same
  * (key…, k, gram, count) rows: both gram sizes (word bigrams AND
  * trigrams) exploded in ONE corpus pass, ONE corpus-sized count agg
  * (map-side combined). The k=2 grams double as a bigram LM's training/
  * scoring pairs (the gram string splits back to (w1, w2) exactly —
  * space-joined space-free tokens round-trip).
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

  /** (keyCols…, k, g, c): per-key word-bigram and -trigram counts in one
    * explosion + one count agg. Callers that explode-amplify a single
    * input split should `repartition` `docs` first (q162's lever —
    * at 100 TB the same knob is files.maxPartitionBytes sized for
    * post-explosion volume).
    */
  def counts(docs: DataFrame, keyCols: Seq[String], textCol: String): DataFrame =
    docs
      .select(keyCols.map(col) :+ TextOps.tokens(col(textCol)).as("__w"): _*)
      .select(keyCols.map(col) :+ explode(flatten(array(
        transform(TextOps.positionalGrams(col("__w"), 2),
          g => struct(lit(2L).as("k"), g.as("g"))),
        transform(TextOps.positionalGrams(col("__w"), 3),
          g => struct(lit(3L).as("k"), g.as("g")))))).as("kg"): _*)
      .select(keyCols.map(col) ++ Seq(col("kg.k").as("k"), col("kg.g").as("g")): _*)
      .groupBy(keyCols.map(col) ++ Seq(col("k"), col("g")): _*)
      .agg(count(lit(1)).as("c"))

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
