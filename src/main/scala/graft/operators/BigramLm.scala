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
  * bit recurrence of [[graft.functions.UnigramRuntime.log2fp]], evaluated
  * per row by the native [[graft.functions.Log2Fp]] scalar inside the
  * count aggregations' projections. No libm, no floats: the DuckDB
  * oracle replays the identical recurrence as the 16-round unrolled
  * HUGEINT program over its bounded distinct-count frame (the
  * [[log2Frame]] shape), and per-token bits sum exactly, so document
  * scores are bit-identical at any parallelism AND across the two
  * evaluation strategies — the parity law is in PropertySpec.
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

  /** The trained model: per-bigram bits, per-context default bits, and
    * the 1-row unseen-context cost — all fixed-point Q16 log2 values.
    * `pairBits`/`ctxBits` are training-vocab-sized; `unk` is 1 row with
    * an `__k = 1` join key (the q126 constant-attach device).
    */
  final case class Lm(pairBits: DataFrame, ctxBits: DataFrame, unk: DataFrame)

  /** Train the add-one-smoothed bigram LM from trusted-slice (w1, w2)
    * rows. The count frames are persisted (each feeds multiple
    * consumers); the log2 frame runs over the bounded distinct-count
    * set. Call once; [[score]] per corpus slice or per micro-batch.
    *
    * `weightCol`: train from PRE-COUNTED (w1, w2, c) rows instead of one
    * row per bigram occurrence — sum(c) replaces count(*), numerically
    * identical, and lets a caller that already aggregated per-doc gram
    * counts (q162's shared gram frame) skip a second corpus explosion.
    *
    * `minPair`/`minCtx` PRUNE the shipped model (CCNet's production
    * shape — the reference LM is a small fixed-vocab model, not the
    * corpus's full tail): contexts with c1 < minCtx and pairs with
    * c2 < minPair (or a pruned context) are dropped AFTER counting, so
    * every RETAINED entry's bits are exactly the full model's — pruning
    * changes which rows ship, never their values. A pruned pair falls
    * back to its context default at scoring, a pruned context to the
    * unseen-context cost (the disclosed estimator). Pruning also
    * shrinks the log2 frame (only retained counts need bits) and makes
    * the tables broadcastable — see [[score]]'s `broadcastLm`. Defaults
    * (1, 1) keep the full exact model.
    */
  def train(trainPairs: DataFrame, weightCol: Option[String] = None,
      minPair: Long = 1L, minCtx: Long = 1L): Lm = {
    val l2 = graft.functions.UnigramExprs.log2fp _
    val c2 = weightCol.fold(
        trainPairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2")))(w =>
        trainPairs.groupBy(col("w1"), col("w2")).agg(sum(col(w)).as("c2")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // c1 and V from the FULL counts — pruning must not change retained
    // values, only drop rows
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val vfr = c2.select(col("w1").as("w")).union(c2.select(col("w2").as("w")))
      .distinct().agg(count(lit(1)).as("V")).withColumn("__k", lit(1))
    // Q16 log2 bits per ROW via the native Log2Fp scalar — bit-identical
    // to the unrolled [[log2Frame]] program (the PropertySpec parity
    // law), without the distinct-vals frame's ~10 extra stages; the lg
    // frame remains the ORACLE's replay device (DuckDB has no exact
    // fixed-point log2 — the bounded frame is how it runs the program)
    val ctxBits = c1.withColumn("__k", lit(1))
      .join(broadcast(vfr), Seq("__k")).drop("__k")
      .where(col("c1") >= minCtx)
      .select(col("w1"), l2(col("c1") + col("V")).as("den_fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the den join doubles as context pruning: a pair whose context was
    // pruned loses its pb row too (hierarchical model consistency)
    val pairBits = c2.where(col("c2") >= minPair)
      .join(ctxBits, Seq("w1"))
      .select(col("w1"), col("w2"),
        (col("den_fp") - l2(col("c2") + lit(1L))).as("pb"))
    val unk = vfr.select(l2(col("V").cast("long")).as("unk_fp"))
      .withColumn("__k", lit(1))
    Lm(pairBits, ctxBits, unk)
  }

  /** Per-key cross-entropy (Q16 bits per bigram, truncating div) of
    * already-exploded (w1, w2) rows under a trained LM: per-bigram bits
    * = pair hit, else the context's default, else the unseen-context
    * cost. Pure — works identically on a batch slice and on a
    * foreachBatch micro-batch (the streaming quality gate).
    *
    * `weightCol`: score PRE-COUNTED (key…, w1, w2, c) rows — per-key
    * bits become sum(bits·c) div sum(c), exactly the positional sum
    * (each distinct bigram contributes its bits c times), so scores are
    * bit-identical to the exploded form while the LM joins run over the
    * per-key DISTINCT bigram frame instead of every position. Overflow-
    * safe: bits ≤ ~2^21 (Q16 log2 of any Long count) and sum(c) per key
    * is the key's token count, so sum(bits·c) stays far inside Long.
    *
    * `broadcastLm`: hint both LM tables broadcast — the production path
    * for a PRUNED model (see [[train]]'s minPair/minCtx): scoring
    * becomes two MAP-SIDE hash joins and the corpus pairs never
    * shuffle. Only safe when the model is vocab-capped; the full exact
    * model's tables grow with the trusted slice and stay AQE-decided.
    */
  /** Per-key cross-entropy under SEVERAL trained LMs in ONE pass over
    * the pairs frame — the DSIR shape (q180: target vs raw importance
    * ratio), where calling [[score]] once per model re-derives and
    * re-aggregates the corpus-sized pairs frame per model. Each model
    * contributes its own left joins (same keys as [[score]]); the
    * single groupBy then evaluates every model's
    * `sum(bits·c) div sum(c)` side by side — each output column is
    * bit-identical to the corresponding [[score]] call by construction
    * (same joins, same coalesce, same integer arithmetic, integer sums
    * commute). Output: keyCols ++ one `<name>` Q16 column per model.
    * Only offered for the weighted (pre-counted) form — that is the
    * only caller shape that needs it.
    */
  def scoreMany(pairs: DataFrame, keyCols: Seq[String], lms: Seq[(String, Lm)],
      weightCol: String, broadcastLm: Boolean = false): DataFrame = {
    require(lms.nonEmpty, "scoreMany needs at least one model")
    // the model names are interpolated into the aggregate's expr() SQL
    // below — a name that is not a plain identifier would break parsing
    // (or worse); refuse it loudly (ADVICE r13)
    lms.foreach { case (name, _) =>
      require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"scoreMany model name must be a plain SQL identifier, got '$name'")
    }
    def bc(df: DataFrame): DataFrame = if (broadcastLm) broadcast(df) else df
    val joined = lms.foldLeft(pairs.withColumn("__k", lit(1))) {
      case (df, (name, lm)) =>
        df.join(bc(lm.pairBits.select(col("w1"), col("w2"),
            col("pb").as(s"__pb_$name"))), Seq("w1", "w2"), "left")
          .join(bc(lm.ctxBits.select(col("w1"),
            col("den_fp").as(s"__den_$name"))), Seq("w1"), "left")
          .join(broadcast(lm.unk.select(col("__k"),
            col("unk_fp").as(s"__unk_$name"))), Seq("__k"))
    }
    val aggs = lms.map { case (name, _) =>
      expr(s"sum((coalesce(__pb_$name, __den_$name, __unk_$name)) * __c) div sum(__c)")
        .as(name)
    }
    joined
      .withColumn("__c", col(weightCol))
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  def score(pairs: DataFrame, keyCols: Seq[String], lm: Lm,
      weightCol: Option[String] = None, broadcastLm: Boolean = false): DataFrame = {
    val pbT = if (broadcastLm) broadcast(lm.pairBits) else lm.pairBits
    val cbT = if (broadcastLm) broadcast(lm.ctxBits) else lm.ctxBits
    val scored = pairs
      .join(pbT, Seq("w1", "w2"), "left")
      .join(cbT, Seq("w1"), "left")
      .withColumn("__k", lit(1))
      .join(broadcast(lm.unk), Seq("__k"))
    weightCol.fold(
      scored
        .select(keyCols.map(col) :+
          coalesce(col("pb"), col("den_fp"), col("unk_fp")).as("bits"): _*)
        .groupBy(keyCols.map(col): _*)
        .agg(expr("sum(bits) div count(1)").as("xent_fp")))(w =>
      scored
        .select(keyCols.map(col) ++ Seq(
          coalesce(col("pb"), col("den_fp"), col("unk_fp")).as("bits"),
          col(w).as("__c")): _*)
        .groupBy(keyCols.map(col): _*)
        .agg(expr("sum(bits * __c) div sum(__c)").as("xent_fp")))
  }
}
