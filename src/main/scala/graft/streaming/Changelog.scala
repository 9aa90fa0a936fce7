package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType

/** Changelog (retraction) streams — K3 parity.
  *
  * The reference prints retraction streams everywhere
  * (`WithStateTtlJob.java:90`, `WindowsProctimeAggJob.java:84`,
  * `CrossJoinJob.java:75` — `toChangelogStream(...).print()` with
  * +I/-U/+U/-D RowKinds). Spark's update mode emits upserts only; this
  * operator closes the gap by explicitly diffing consecutive snapshots of
  * a keyed view and emitting the row kinds:
  *
  *  - `+I` key appears;
  *  - `-U`/`+U` key's row changed (old row, then new row — array order is
  *    preserved through the explode, so per key the retraction precedes
  *    the update, Flink's emission order);
  *  - `-D` key disappears (TTL/retention — the `retain` predicate).
  *
  * Granularity: `compacted = true` (default) emits one transition per
  * key per micro-batch; `compacted = false` emits EVERY intra-batch hop
  * (each successive champion in `newerBy` order retracts its
  * predecessor — Flink's per-row changelog for its Deduplicate
  * operator, `WithStateTtlJob.java:90`), with a `__seq` column ordering
  * the hops per key. Both granularities replay to the identical final
  * table — asserted by StreamingSpec.
  *
  * Fault tolerance: with `snapshotDir` set, the running snapshot is
  * persisted per batchId (`<dir>/batch=<id>`) and the PREVIOUS batch's
  * snapshot is re-read at the start of every batch — so a query restart
  * resumes from the committed snapshot instead of re-emitting +I for
  * every live key, and an at-least-once foreachBatch RETRY of batch N
  * recomputes its delta from snapshot N-1 (idempotent, not
  * double-applied). Without `snapshotDir` the snapshot lives only in
  * this query run's memory: correct across batches of ONE uninterrupted
  * run, WRONG across restarts — use it only for fire-and-forget jobs.
  *
  * 100 TB design: the diff is one full-outer equi-join of two
  * keep-latest snapshots, hash-partitioned by key — no driver
  * materialization, no per-row state RPCs. The in-memory snapshot is
  * `localCheckpoint`ed each batch so lineage stays O(1) in batches
  * (persisted snapshots get the same cut from the parquet round-trip),
  * and its size is O(live keys), the same state bound as Flink's dedup
  * operator with TTL.
  */
object Changelog {

  val RowKindCol = "row_kind"
  val SeqCol = "__seq"

  /** Changelog between two keyed snapshots (one row per key each).
    * Returns `row_kind` ++ keys ++ value columns; unchanged keys emit
    * nothing. Null-safe in BOTH positions (review r13 pass 6): value
    * structs compare field-wise with SQL container semantics (null ==
    * null inside a struct), and the snapshots join on NULL-SAFE key
    * equality (`<=>`) — a plain equi-join never matches a NULL key, so
    * an unchanged null-keyed row (e.g. a kafka record with a null key,
    * grouped as ONE key by the keep-latest window) would emit a
    * spurious -D/+I pair every batch and could replay to ABSENT.
    */
  def diff(prev: DataFrame, next: DataFrame, keys: Seq[String]): DataFrame = {
    require(prev.columns.sameElements(next.columns),
      s"snapshot schemas differ: ${prev.columns.mkString(",")} vs ${next.columns.mkString(",")}")
    require(keys.nonEmpty && keys.forall(next.columns.contains), s"bad keys $keys")
    val valueCols = next.columns.filterNot(keys.contains).toSeq
    def packed(df: DataFrame, as: String) =
      df.select(keys.map(col) :+ struct(valueCols.map(col): _*).as(as): _*)
    val l = packed(prev, "__old").as("__l")
    val r = packed(next, "__new").as("__r")
    val j = l.join(r, keys.map(k => col(s"__l.$k") <=> col(s"__r.$k")).reduce(_ && _),
        "full_outer")
      .select(keys.map(k => coalesce(col(s"__l.$k"), col(s"__r.$k")).as(k)) :+
        col("__l.__old").as("__old") :+ col("__r.__new").as("__new"): _*)
    // every branch emits a non-empty array of one struct type ("=" rows
    // are filtered after the explode) — keeps when/otherwise type-stable
    val changes = j.select(
      keys.map(col) :+ explode(
        when(col("__old").isNull, array(struct(lit("+I").as(RowKindCol), col("__new").as("v"))))
          .when(col("__new").isNull, array(struct(lit("-D").as(RowKindCol), col("__old").as("v"))))
          .when(col("__old") =!= col("__new"),
            array(
              struct(lit("-U").as(RowKindCol), col("__old").as("v")),
              struct(lit("+U").as(RowKindCol), col("__new").as("v"))))
          .otherwise(array(struct(lit("=").as(RowKindCol), col("__new").as("v"))))).as("__c"): _*)
    changes
      .where(col("__c").getField(RowKindCol) =!= "=")
      .select(col("__c").getField(RowKindCol).as(RowKindCol) +:
        keys.map(col) ++:
        valueCols.map(c => col("__c").getField("v").getField(c).as(c)): _*)
  }

  /** Per-row (non-compacted) hops of one micro-batch against the prev
    * snapshot: every batch row that improves on the running champion (in
    * `newerBy` order) emits a transition retracting its predecessor —
    * +I for a fresh key's first hop, -U/+U pairs after. Output: diff()'s
    * columns plus [[SeqCol]] (0-based per-key emission index; -U at
    * 2i, its +U at 2i+1) — Flink emits these in arrival order, a batch
    * has no arrival order, so `newerBy` order IS the hop order and
    * `__seq` makes it explicit to consumers.
    *
    * Stale batch rows (not newer than the prev champion) emit nothing,
    * exactly like [[KeepLatest.transition]].
    */
  def perRowHops(
      prev: DataFrame,
      batch: DataFrame,
      keys: Seq[String],
      newerBy: Seq[Column]): DataFrame = {
    val valueCols = batch.columns.filterNot(keys.contains).toSeq
    val ord = struct(newerBy: _*)
    val prevP = prev.select(
      keys.map(col) :+ struct(valueCols.map(col): _*).as("__pv") :+ ord.as("__po"): _*)
    val b = batch.select(
      keys.map(col) :+ struct(valueCols.map(col): _*).as("__v") :+ ord.as("__o"): _*)
    // rows that ever hold the championship: newer than the prev-state
    // champion (left join; fresh keys have no bar to clear). NULL-SAFE
    // key join (review r13 pass 6): a plain equi-join never matches a
    // null key, so a stale null-keyed batch row would bypass the prev
    // champion's bar and assert a +I the snapshot contradicts
    val live = b.as("__b").join(prevP.as("__p"),
        keys.map(k => col(s"__b.$k") <=> col(s"__p.$k")).reduce(_ && _), "left_outer")
      .select(keys.map(k => col(s"__b.$k").as(k)) :+ col("__b.__v").as("__v") :+
        col("__b.__o").as("__o") :+ col("__p.__pv").as("__pv") :+
        col("__p.__po").as("__po"): _*)
      .where(col("__po").isNull || col("__o") > col("__po"))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__o").asc)
    val hops = live.select(
      keys.map(col) :+ col("__v") :+ col("__pv") :+
        row_number().over(w).as("__rn") :+ lag(col("__v"), 1).over(w).as("__lag"): _*)
    // hop i retracts hop i-1 (or the prev-state champion for hop 1)
    val retractV = coalesce(col("__lag"), col("__pv"))
    val exploded = hops.select(
      keys.map(col) :+ explode(
        when(col("__rn") === 1 && col("__pv").isNull,
          array(struct(lit("+I").as(RowKindCol), col("__v").as("v"),
            lit(0L).as(SeqCol))))
          .otherwise(array(
            struct(lit("-U").as(RowKindCol), retractV.as("v"),
              (col("__rn") * 2 - 2).cast("long").as(SeqCol)),
            struct(lit("+U").as(RowKindCol), col("__v").as("v"),
              (col("__rn") * 2 - 1).cast("long").as(SeqCol))))).as("__c"): _*)
    exploded.select(
      col("__c").getField(RowKindCol).as(RowKindCol) +:
        keys.map(col) ++:
        valueCols.map(c => col("__c").getField("v").getField(c).as(c)) :+
        col("__c").getField(SeqCol).as(SeqCol): _*)
  }

  /** Streaming changelog: maintain a keep-latest snapshot of `updates`
    * (keyed by `keys`, ordered by `newerBy` — include a tiebreaker for a
    * strict total order) and hand each micro-batch's changelog to `sink`.
    *
    * `retain` is the retention/TTL analog: snapshot rows failing it are
    * dropped and emit `-D` (compacted: with their last-retained values;
    * per-row: retracting the just-asserted final hop — both replay to
    * the key's absence).
    *
    * `compacted = false` switches to per-row hop emission (see
    * [[perRowHops]]; the delta then carries the extra [[SeqCol]]).
    *
    * `snapshotDir` makes the changelog restart- and retry-safe (see
    * class doc); leave it None only for single-run jobs.
    */
  def stream(
      updates: DataFrame,
      keys: Seq[String],
      newerBy: Seq[Column],
      retain: Column = lit(true),
      compacted: Boolean = true,
      snapshotDir: Option[String] = None)(sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    var snapshot: Option[DataFrame] = None
    updates.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val prev = resolvePrev(spark, snapshot, snapshotDir, batchId, batch.schema)
      val merged0 = graft.operators.Dedup.keepLatest(prev.unionByName(batch), keys, newerBy)
      // per-row mode consumes `merged` TWICE (the stored snapshot and
      // the -D side) — without a cut the second consumer re-runs the
      // full union + window-dedup shuffle over prev ∪ batch every
      // trigger (review r13 pass 6); compacted mode uses it once and
      // stays lazy
      val merged = if (compacted) merged0 else merged0.localCheckpoint(true)
      // three-valued logic: a NULL retain verdict must evict (and emit
      // -D), not fall through both the keep filter AND its negation —
      // `!NULL` is NULL, so a bare `where(!retain)` would silently drop
      // the key from state with no retraction in per-row mode
      val keep = coalesce(retain, lit(false))
      val next = store(merged.where(keep), snapshotDir, batchId, spark)
      val delta =
        if (compacted) diff(prev, next, keys)
        else {
          val hops = perRowHops(prev, batch, keys, newerBy)
          // retention: the final champion of an evicted key retracts
          // itself after its hops (MaxValue sequences it last)
          val valueCols = batch.columns.filterNot(keys.contains).toSeq
          val dels = merged.where(!keep).select(
            lit("-D").as(RowKindCol) +: keys.map(col) ++:
              valueCols.map(col) :+ lit(Long.MaxValue).as(SeqCol): _*)
          hops.unionByName(dels)
        }
      sink(delta, batchId)
      // the replaced snapshot's cached blocks become unreachable here;
      // Spark's ContextCleaner unpersists them on GC
      snapshot = Some(next)
    }
  }

  /** Changelog of a (windowed) AGGREGATION — the reference's other
    * retraction shape (`WindowsProctimeAggJob.java:84`: window counts
    * printed as a changelog, each window's count retracting its previous
    * value as rows arrive).
    *
    * `partial` maps one micro-batch to PARTIAL aggregate rows
    * (keys ++ `mergeCols`), where every merge column is sum-mergeable
    * with a union-stable type (counts and sums over long/double — cast
    * in `partial`; Spark's default decimal sum widening would drift the
    * snapshot schema batch-to-batch). The running snapshot holds MERGED
    * partials per key, so a batch costs one batch-local partial agg +
    * one merge over O(live keys) snapshot rows — incremental, never a
    * recompute of history. This is exactly Spark's own partial/final agg
    * split, held open across batches.
    *
    * `retain` bounds the state for windowed keys (the reference's
    * state-TTL): merged rows failing it (e.g. `window < now - 1 day`)
    * are evicted with a `-D` of their last-emitted values, and the
    * O(live keys) claim then really means retained keys. A late partial
    * for an evicted key restarts that key from the new contribution
    * alone — Flink's post-TTL behavior. `snapshotDir`: see class doc.
    */
  def aggChangelog(
      updates: DataFrame,
      partial: DataFrame => DataFrame,
      keys: Seq[String],
      mergeCols: Seq[String],
      retain: Column = lit(true),
      snapshotDir: Option[String] = None)(sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    require(mergeCols.nonEmpty, "need at least one merge column")
    var snapshot: Option[DataFrame] = None
    updates.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val p = partial(batch)
      val prev = resolvePrev(spark, snapshot, snapshotDir, batchId, p.schema)
      val merged = prev.unionByName(p)
        .groupBy(keys.map(col): _*)
        .agg(sum(col(mergeCols.head)).as(mergeCols.head),
          mergeCols.tail.map(c => sum(col(c)).as(c)): _*)
      // column order can differ after groupBy/agg; restore the partial's.
      // Compare TYPES too (review r13 pass 6): sum()'s widening (int ->
      // long, decimal p -> p+10) would pass a name-only check, write the
      // widened snapshot, and crash resolvePrev's schema-pinned read one
      // batch later — enforce the doc's cast-in-partial contract here
      def sig(df: DataFrame) = df.schema.fields.map(f => (f.name, f.dataType)).sortBy(_._1)
      require(sig(merged).sameElements(sig(p)),
        s"partial must emit exactly keys ++ mergeCols with sum-stable types " +
          s"(cast in partial): ${p.schema.simpleString} vs merged ${merged.schema.simpleString}")
      // NULL retain verdict = evict (see stream(); diff then emits -D)
      val next = store(merged.where(coalesce(retain, lit(false))).select(p.columns.map(col): _*),
        snapshotDir, batchId, spark)
      sink(diff(prev, next, keys), batchId)
      snapshot = Some(next)
    }
  }

  // ------------------------------------------- snapshot persistence

  /** The prev snapshot for `batchId`: from `snapshotDir` when set (the
    * newest committed snapshot with id < batchId — restart/retry-safe),
    * else this run's in-memory snapshot, else empty.
    */
  private def resolvePrev(
      spark: SparkSession,
      inMemory: Option[DataFrame],
      snapshotDir: Option[String],
      batchId: Long,
      schema: StructType): DataFrame =
    snapshotDir match {
      case Some(dir) =>
        latestBefore(spark, dir, batchId)
          .map(id => spark.read.schema(schema).parquet(s"$dir/batch=$id"))
          .getOrElse(empty(spark, schema))
      case None =>
        inMemory.getOrElse(empty(spark, schema))
    }

  /** Materialize `next`: to `<dir>/batch=<batchId>` (re-read for an O(1)
    * downstream plan; older snapshots pruned, keeping batchId-1 for
    * retries) when persisting, else a localCheckpoint.
    */
  private def store(
      next: DataFrame,
      snapshotDir: Option[String],
      batchId: Long,
      spark: SparkSession): DataFrame =
    snapshotDir match {
      case Some(dir) =>
        val path = s"$dir/batch=$batchId"
        next.write.mode("overwrite").parquet(path)
        val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
        // prune older snapshots (keep batchId-1 for foreachBatch retries)
        // AND any id beyond batchId — leftovers of a dead incarnation
        // (checkpoint reset with a reused snapshotDir restarts batchIds
        // at 0; a stale future snapshot would later resolve as prev and
        // emit retractions this run never asserted)
        snapshotIds(spark, dir).filter(id => id < batchId - 1 || id > batchId)
          .foreach(id => fs.delete(new Path(s"$dir/batch=$id"), true))
        spark.read.schema(next.schema).parquet(path)
      case None =>
        next.localCheckpoint(true) // truncate lineage: O(1) plan depth
    }

  private def snapshotIds(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("batch=") => n.stripPrefix("batch=").toLong }
  }

  private def latestBefore(spark: SparkSession, dir: String, batchId: Long): Option[Long] = {
    val before = snapshotIds(spark, dir).filter(_ < batchId)
    if (before.isEmpty) None else Some(before.max)
  }

  private def empty(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[Row](), schema)
}
