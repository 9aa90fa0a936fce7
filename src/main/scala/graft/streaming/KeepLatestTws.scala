package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** [[KeepLatest]] on Spark 4's `transformWithState` — the successor
  * public API to `flatMapGroupsWithState` (SPARK-46815, "arbitrary
  * stateful processing v2"): first-class per-state TTL (`TTLConfig` on
  * the state variable instead of a hand-rolled timeout dance), multiple
  * named state variables per processor, timers, and schema-evolvable
  * state — exactly the T2/T3 semantics surface.
  *
  * Semantics are identical to [[KeepLatest]] (same champion transition,
  * same update-mode emit-on-change contract); both twins pass the same
  * batch-equivalence and checkpoint-recovery suites in StreamingSpec.
  * Differences that matter operationally:
  *  - TTL here is declarative — the store expires the value itself
  *    (`TTLConfig(Duration)`), where the old API re-arms a processing-
  *    time timeout on every update;
  *  - `transformWithState` REQUIRES the RocksDB state-store provider
  *    (Spark enforces it) — the right default at the target scale, but
  *    the reason [[KeepLatest]] stays: the heap-provider path and the
  *    `TestGroupState` unit-test surface only exist on the old API.
  *    SURVEY §7.4 records this split.
  */
object KeepLatestTws {

  /** The champion transition as a StatefulProcessor: one ValueState row
    * per key; emits only when the champion changes (update-mode upsert
    * semantics, [[KeepLatest.transition]]'s contract).
    */
  final class Processor[K, T](
      newerThan: (T, T) => Boolean,
      ttlMs: Option[Long],
      enc: Encoder[T]) extends StatefulProcessor[K, T, T] {
    @transient private var champion: ValueState[T] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val conf = ttlMs
        .map(ms => TTLConfig(java.time.Duration.ofMillis(ms)))
        .getOrElse(TTLConfig.NONE)
      champion = getHandle.getValueState[T]("champion", enc, conf)
    }

    override def handleInputRows(
        key: K, rows: Iterator[T], timerValues: TimerValues): Iterator[T] = {
      val current = if (champion.exists()) Some(champion.get()) else None
      val best = rows.foldLeft(current) {
        case (None, r) => Some(r)
        case (Some(b), r) => if (newerThan(r, b)) Some(r) else Some(b)
      }
      best match {
        case Some(c) =>
          champion.update(c)
          if (!current.contains(c)) Iterator.single(c) else Iterator.empty
        case None => Iterator.empty
      }
    }
  }

  /** Latest row per key — [[KeepLatest.apply]]'s signature on the new
    * API. TTL (when set) is enforced by the state store itself; the
    * query must run on the RocksDB provider (a Spark requirement for
    * this operator, asserted at query start).
    */
  def apply[K: Encoder, T: Encoder](
      ds: Dataset[T],
      key: T => K,
      newerThan: (T, T) => Boolean,
      ttlMs: Option[Long] = None): Dataset[T] = {
    val enc = implicitly[Encoder[T]]
    // TimeMode gates batch scheduling, not just the TTL clock: under
    // ProcessingTime the operator asks for a batch every trigger to
    // service potential expirations, which with a 0-interval trigger is
    // a busy loop of empty micro-batches (observed: >1000 stages before
    // the first processAllAvailable returned). Only request it when TTL
    // actually needs the clock.
    val timeMode = if (ttlMs.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    ds.groupByKey(key)
      .transformWithState[T](
        new Processor[K, T](newerThan, ttlMs, enc),
        timeMode,
        OutputMode.Update())
  }
}
