package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate removal — the CCNet/RefinedWeb "shared
  * paragraph" scrub: segments that occur in many documents (headers,
  * footers, nav bars, license blurbs, duplicated passages) are deleted
  * from EVERY document, keeping each doc's residual unique content.
  *
  * Real web corpora segment on newlines/sentences; the harness corpus is
  * flat word text, so the segment unit here is the non-overlapping
  * `chunkTokens`-token window (same windowing arithmetic as [[Chunks]]).
  * The algorithm is segmentation-agnostic: swap the chunker for a
  * newline split and nothing else changes.
  *
  * Shape at 100 TB: one map-side explode (bounded by doc length over
  * chunk size), ONE global frequency aggregation on the chunk key, an
  * anti-join of chunks against the frequent set (usually tiny — AQE
  * broadcasts it when it fits; at threshold k its size is bounded by
  * total_chunks / k), and one per-doc regroup to reassemble text. No
  * all-pairs anything; every shuffle is an equi-key AQE can split.
  * Chunks join on their full text here for oracle exactness — at scale
  * you would join on an 8-byte [[TextOps.polyHash]] of the chunk and
  * keep strings only in the reassembly payload.
  */
object Boilerplate {

  /** Remove every chunk whose corpus frequency is >= `maxFreq`; rebuild
    * each surviving document from its remaining chunks in order.
    * Output: idCol, n_chunks (pre-scrub), kept_chunks, cleaned_text —
    * one row per document with at least one surviving chunk.
    */
  def scrubFrequentChunks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int = 4,
      maxFreq: Int = 2): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(maxFreq >= 2, s"maxFreq must be >= 2 (1 would scrub everything), got $maxFreq")
    val sz = chunkTokens.toLong
    // ceil(n/sz) = floor((n-1)/sz)+1 chunks per doc (n >= 1 always:
    // even empty text tokenizes to [""]), short last chunk kept
    val nChunks = RangeJoin.fdiv(TextOps.tokenCount(col("__w")) - 1L, sz) + 1L
    val chunks = docs
      // NULL text -> null tokens -> the explode below would silently drop
      // the doc; coalesce to the empty-text token array (one "" chunk),
      // matching how empty text already behaves
      .select(col(idCol), coalesce(TextOps.tokens(col(textCol)), array(lit(""))).as("__w"))
      .select(col(idCol), col("__w"), nChunks.as("__n"),
        explode(sequence(lit(0L), nChunks - 1L)).as("__ix"))
      .select(col(idCol), col("__n"), col("__ix"),
        array_join(slice(col("__w"), (col("__ix") * sz + 1L).cast("int"), lit(chunkTokens)), " ")
          .as("__chunk"))
    val frequent = chunks
      .groupBy(col("__chunk")).agg(count(lit(1)).as("__cnt"))
      .where(col("__cnt") >= maxFreq)
      .select(col("__chunk"))
    chunks
      .join(frequent, Seq("__chunk"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        max(col("__n")).as("n_chunks"),
        count(lit(1)).as("kept_chunks"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("__ix"), col("__chunk")))),
            x => x.getField("__chunk")),
          " ").as("cleaned_text"))
  }
}
