package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram-LM perplexity scoring — the CCNet quality-filter device
  * (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
  * Datasets from Web Crawl Data"): train a small reference language
  * model on a trusted slice, score every document's cross-entropy under
  * it, and filter the high-perplexity tail. CCNet's reference model is
  * a KenLM n-gram LM trained on Wikipedia; the exact-arithmetic
  * miniature here is an add-one-smoothed bigram LM trained on the
  * corpus's own trusted slice.
  *
  * Determinism is the design constraint (the [[graft.functions.UnigramRuntime]]
  * discipline): every probability lives as a FIXED-POINT integer log2
  * value — floor(log2(x)·2^16) — computed by the exact square-and-compare
  * bit recurrence of [[graft.functions.UnigramRuntime.log2fp]], here
  * evaluated COLUMN-WISE as 16 unrolled integer projections over the
  * bounded distinct-count frame. No libm, no floats: the DuckDB oracle
  * replays the identical unrolled program in HUGEINT, and per-token
  * bits sum exactly, so document scores are bit-identical at any
  * parallelism. The parity law vs the scalar log2fp is in PropertySpec.
  */
object BigramLm {

  /** (w1, w2) successor pairs of a token-array column — successor-zip,
    * entirely map-side (the q88 bigram device as a struct stream).
    */
  def bigramPairs(toks: Column): Column =
    zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => struct(a.as("w1"), b.as("w2")))

  /** floor(log2(val)·2^16) for a BIGINT column `valCol` ≥ 1:
    * [[graft.functions.UnigramRuntime.log2fp]]'s exact recurrence as
    * unrolled column arithmetic — msb from the binary-string length
    * (`length(bin(val)) - 1`, exact in both engines), the Q32 mantissa
    * squared through DECIMAL(20,0) (y ≤ 2^33, so y² ≤ 2^66 needs more
    * than a BIGINT mid-round), one shift-and-compare per fraction bit.
    *
    * The input frame must be BOUNDED (distinct smoothed counts —
    * vocab-sized at worst): 16 stacked projections over it are cheap,
    * and Catalyst keeps them as separate codegen'd stages because each
    * round's `__z` is referenced more than once (CollapseProject only
    * inlines cheap expressions — the same reason the DuckDB replay
    * marks its round CTEs MATERIALIZED).
    */
  def log2Frame(vals: DataFrame, valCol: String = "val"): DataFrame = {
    var f = vals
      .withColumn("__msb", (length(expr(s"bin($valCol)")) - 1).cast("long"))
      .withColumn("__y", expr(
        s"IF(__msb >= 32, $valCol div shiftleft(CAST(1 AS BIGINT), CAST(__msb - 32 AS INT)), " +
          s"$valCol * shiftleft(CAST(1 AS BIGINT), CAST(32 - __msb AS INT)))"))
      .withColumn("__frac", lit(0L))
    (1 to 16).foreach { _ =>
      f = f
        .withColumn("__z", expr(
          "CAST((CAST(__y AS DECIMAL(20,0)) * CAST(__y AS DECIMAL(20,0))) div 4294967296 AS BIGINT)"))
        .withColumn("__frac", expr("__frac * 2 + IF(__z >= 8589934592, 1, 0)"))
        .withColumn("__y", expr("IF(__z >= 8589934592, __z div 2, __z)"))
        .drop("__z")
    }
    f.select(col(valCol), (col("__msb") * lit(65536L) + col("__frac")).as("l2fp"))
  }
}
