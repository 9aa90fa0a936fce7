package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff: classify every key across two dataset versions
  * as added / removed / changed / same — the audit stage between two
  * crawls or two curation runs ("what did this pipeline change?"), and
  * the input to incremental downstream work (re-embed only `added` +
  * `changed`, retire `removed`).
  *
  * One FULL OUTER shuffle hash join on the key; comparison columns are
  * evaluated as a single null-safe conjunction (`<=>`, so NULL values
  * compare equal to NULL, not unknown). Nothing is collected; at 100 TB
  * this is one co-partitioned pass, and if both versions are written
  * bucketed by the key ([[graft.sinks.Bucketing]]) the join plans with
  * zero exchanges.
  *
  * Keys must be unique per side (version semantics); duplicate keys
  * would multiply join rows and misreport counts — run
  * [[Dedup.keepLatest]] first for at-least-once-ingested snapshots.
  */
object SnapshotDiff {

  val Added = "added"
  val Removed = "removed"
  val Changed = "changed"
  val Same = "same"

  /** Per-key status between `oldV` and `newV`. Output: key column (from
    * whichever side has it), `status`, plus `compareCols` from the new
    * side (NULL for removed keys).
    */
  def diff(
      oldV: DataFrame,
      newV: DataFrame,
      keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must name at least one column")
    require((keyCol +: compareCols).forall(oldV.columns.contains),
      s"old side missing columns: key=$keyCol compare=$compareCols")
    require((keyCol +: compareCols).forall(newV.columns.contains),
      s"new side missing columns: key=$keyCol compare=$compareCols")

    val o = oldV.select((keyCol +: compareCols).map(c => col(c).as(s"__o_$c")): _*)
    val n = newV.select((keyCol +: compareCols).map(c => col(c).as(s"__n_$c")): _*)
    val unchanged: Column =
      compareCols.map(c => col(s"__o_$c") <=> col(s"__n_$c")).reduce(_ && _)
    o.join(n, col(s"__o_$keyCol") === col(s"__n_$keyCol"), "full_outer")
      .select(
        (coalesce(col(s"__n_$keyCol"), col(s"__o_$keyCol")).as(keyCol) +:
          when(col(s"__o_$keyCol").isNull, lit(Added))
            .when(col(s"__n_$keyCol").isNull, lit(Removed))
            .when(unchanged, lit(Same))
            .otherwise(lit(Changed)).as("status") +:
          compareCols.map(c => col(s"__n_$c").as(c))): _*)
  }
}
