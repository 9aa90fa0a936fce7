package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size token-window chunking with overlap — the RAG / context-
  * assembly stage that splits each document into `size`-token windows
  * every `stride` tokens (overlap = size - stride).
  *
  * Entirely map-side: the explode emits `floor((n-1)/stride)+1` rows per
  * document (bounded by doc length over stride — no shuffle, no state),
  * so at 100 TB it streams with the parquet scan exactly like the other
  * TextOps columns; chunk arithmetic is integer floor-division only.
  *
  * Each chunk row carries a position-weighted integer checksum of the
  * chunk's word hashes (`Σ (i+1)·polyhash(wᵢ)`, exact in BIGINT: ≤ size ·
  * size · 1e9+7), proving order-correct windowing to the q73 oracle
  * without comparing string arrays.
  */
object Chunks {

  /** Explode `textCol` of `df` into overlapping token windows.
    * Output: idCol, chunk_ix (0-based), n_tok, checksum — one row per
    * chunk; every document yields at least one chunk.
    */
  def tokenWindows(df: DataFrame, idCol: String, textCol: String, chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      s"need 1 <= stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val nChunks = RangeJoin.fdiv(TextOps.tokenCount(col("__w")) - 1L, stride.toLong) + 1L
    val chunk = slice(col("__w"), (col("chunk_ix") * stride + 1L).cast("int"), lit(chunkSize))
    // NULL text tokenizes to null, and explode(sequence(0, null)) would
    // silently DROP the row — coalesce to the empty-text token array so
    // the documented at-least-one-chunk invariant holds for every doc
    df.select(col(idCol), coalesce(TextOps.tokens(col(textCol)), array(lit(""))).as("__w"))
      .select(col(idCol), col("__w"),
        explode(sequence(lit(0L), nChunks - 1L)).as("chunk_ix"))
      .select(col(idCol), col("chunk_ix"), chunk.as("__c"))
      .select(col(idCol), col("chunk_ix"),
        size(col("__c")).cast("long").as("n_tok"),
        posWeightedSum(TextOps.polyHashAll(col("__c"))).as("checksum"))
  }

  /** Σ (i+1)·arr[i] over a BIGINT array, 0 for empty — order-sensitive
    * integer checksum (the q68 convention, in-array so it stays map-side).
    */
  def posWeightedSum(arr: Column): Column =
    aggregate(transform(arr, (x, i) => x * (i + lit(1L))), lit(0L), _ + _)
}
