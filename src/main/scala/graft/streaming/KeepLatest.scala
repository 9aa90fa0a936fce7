package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming keep-latest-per-key deduplication with state TTL.
  *
  * Reference capability: the ROW_NUMBER keep-latest dedup view that Flink
  * compiles to a streaming Deduplicate operator (flink playground
  * `WithDeduplicateJoinJob.java:89-97`), the primary-key upsert view
  * (`WithStateTtlJob.java:73-77`), and the per-table/global state TTLs
  * (`WithDeduplicateJoinJob.java:98`, `WithStateTtlJob.java:43-45`).
  *
  * Spark-first: ranking windows are illegal on streams, and
  * `dropDuplicates` keeps the FIRST row per key; keep-LATEST needs custom
  * state. `groupByKey.flatMapGroupsWithState` in Update mode stores one
  * row per key (the current champion) and emits only when the champion
  * changes — exactly Flink's Deduplicate(keep last row) operator's
  * changelog, minus retractions (Spark update mode upserts by key).
  *
  * TTL maps to `GroupStateTimeout.ProcessingTimeTimeout`: a key whose
  * state sees no update for `ttlMs` is evicted (its next event re-creates
  * it fresh) — the reference's `table.exec.state.ttl` semantics.
  *
  * Scale notes: state is one row per key, hash-partitioned by key across
  * `spark.sql.shuffle.partitions` state-store partitions; per-batch work
  * is one shuffle of the new rows only. At 100 TB/day of events this is
  * the standard changelog-compaction shape (RocksDB state store provider
  * for beyond-heap state).
  */
object KeepLatest {

  /** Latest row per key in a stream. `newerThan(a, b)` = "a is newer than
    * b" — must be a strict total order (include a unique tiebreaker) so
    * results are deterministic under any arrival interleaving.
    *
    * @param ttlMs processing-time state TTL; None = keep state forever
    *              (the reference's default when no TTL hint is set).
    */
  def apply[K: Encoder, T: Encoder](
      ds: Dataset[T],
      key: T => K,
      newerThan: (T, T) => Boolean,
      ttlMs: Option[Long] = None): Dataset[T] = {
    val timeoutConf =
      if (ttlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(key)
      .flatMapGroupsWithState[T, T](OutputMode.Update(), timeoutConf)(
        transition[K, T](newerThan, ttlMs))
  }

  /** The state-transition function alone, for direct unit testing with
    * `TestGroupState` (timeout/eviction paths are hard to drive through a
    * real clock).
    */
  def transition[K, T](
      newerThan: (T, T) => Boolean,
      ttlMs: Option[Long])(key: K, rows: Iterator[T], state: GroupState[T]): Iterator[T] =
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val current = state.getOption
      val champion = rows.foldLeft(current) {
        case (None, r) => Some(r)
        case (Some(best), r) => if (newerThan(r, best)) Some(r) else Some(best)
      }
      (champion, current) match {
        case (Some(c), old) =>
          state.update(c)
          ttlMs.foreach(state.setTimeoutDuration)
          if (!old.contains(c)) Iterator.single(c) else Iterator.empty
        case (None, _) => Iterator.empty
      }
    }
}
