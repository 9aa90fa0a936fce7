package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

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
  * Granularity is the micro-batch: intra-batch churn on one key compacts
  * to a single transition per batch (Flink's per-row changelog shows each
  * hop). The compacted stream replays to the identical final table —
  * asserted by StreamingSpec.
  *
  * 100 TB design: the diff is one full-outer equi-join of two
  * keep-latest snapshots, hash-partitioned by key — no driver
  * materialization, no per-row state RPCs. The running snapshot is
  * `localCheckpoint`ed each batch so lineage stays O(1) in batches, and
  * its size is O(live keys), the same state bound as Flink's dedup
  * operator with TTL.
  */
object Changelog {

  val RowKindCol = "row_kind"

  /** Changelog between two keyed snapshots (one row per key each).
    * Returns `row_kind` ++ keys ++ value columns; unchanged keys emit
    * nothing. Null-safe: value structs compare field-wise with SQL
    * container semantics (null == null inside a struct).
    */
  def diff(prev: DataFrame, next: DataFrame, keys: Seq[String]): DataFrame = {
    require(prev.columns.sameElements(next.columns),
      s"snapshot schemas differ: ${prev.columns.mkString(",")} vs ${next.columns.mkString(",")}")
    require(keys.nonEmpty && keys.forall(next.columns.contains), s"bad keys $keys")
    val valueCols = next.columns.filterNot(keys.contains).toSeq
    def packed(df: DataFrame, as: String) =
      df.select(keys.map(col) :+ struct(valueCols.map(col): _*).as(as): _*)
    val j = packed(prev, "__old").join(packed(next, "__new"), keys, "full_outer")
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

  /** Streaming changelog: maintain a keep-latest snapshot of `updates`
    * (keyed by `keys`, ordered by `newerBy` — include a tiebreaker for a
    * strict total order) and hand each micro-batch's changelog to `sink`.
    *
    * `retain` is the retention/TTL analog: snapshot rows failing it are
    * dropped and emit `-D` with their last-retained values (the
    * reference's state-TTL eviction made visible as a retraction).
    */
  def stream(
      updates: DataFrame,
      keys: Seq[String],
      newerBy: Seq[Column],
      retain: Column = lit(true))(sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    var snapshot: Option[DataFrame] = None
    updates.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val prev = snapshot.getOrElse(
        batch.sparkSession.createDataFrame(new java.util.ArrayList[Row](), batch.schema))
      val next = graft.operators.Dedup
        .keepLatest(prev.unionByName(batch), keys, newerBy)
        .where(retain)
        .localCheckpoint(true) // truncate lineage: O(1) plan depth across batches
      sink(diff(prev, next, keys), batchId)
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
    */
  def aggChangelog(
      updates: DataFrame,
      partial: DataFrame => DataFrame,
      keys: Seq[String],
      mergeCols: Seq[String])(sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    require(mergeCols.nonEmpty, "need at least one merge column")
    var snapshot: Option[DataFrame] = None
    updates.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val p = partial(batch)
      val prev = snapshot.getOrElse(
        batch.sparkSession.createDataFrame(new java.util.ArrayList[Row](), p.schema))
      val merged = prev.unionByName(p)
        .groupBy(keys.map(col): _*)
        .agg(sum(col(mergeCols.head)).as(mergeCols.head),
          mergeCols.tail.map(c => sum(col(c)).as(c)): _*)
      // column order can differ after groupBy/agg; restore the partial's
      require(merged.columns.sorted.sameElements(p.columns.sorted),
        s"partial must emit exactly keys ++ mergeCols: ${p.columns.mkString(",")}")
      val next = merged.select(p.columns.map(col): _*).localCheckpoint(true)
      sink(diff(prev, next, keys), batchId)
      snapshot = Some(next)
    }
  }
}
