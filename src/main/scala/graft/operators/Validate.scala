package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the constraint-check stage a
  * production pipeline runs on every ingest batch before letting data
  * into training (the Deequ/Great-Expectations shape, re-expressed as
  * plain Spark aggregations).
  *
  * Each check compiles to ONE distributed aggregation (or one anti-join
  * for referential checks) returning a single (check, violations,
  * n_checked) row; a suite is the union. Nothing collects to the driver:
  * at 100 TB each check is a scan-side map + one partial-agg shuffle of
  * 32 numbers, and independent checks on the SAME table could further
  * share one scan via a single multi-aggregate (the per-check form here
  * keeps the report composable).
  *
  * Determinism: counts only — no floats, no sampling — so the report is
  * bit-stable across engines and cluster layouts.
  */
object Validate {

  private def report(name: String, violations: Column, checked: Column)(df: DataFrame): DataFrame =
    df.agg(violations.cast("long").as("violations"), checked.cast("long").as("n_checked"))
      .select(lit(name).as("check"), col("violations"), col("n_checked"))

  /** Duplicate-key violations: rows beyond the first of each key tuple
    * (count(*) - count(distinct key)). Null keys count as a key value.
    */
  def uniqueKey(df: DataFrame, name: String, keys: Seq[String]): DataFrame =
    report(name,
      count(lit(1)) - count_distinct(struct(keys.map(col): _*)),
      count(lit(1)))(df)

  /** Referential-integrity orphans: child rows whose non-null foreign key
    * has no match in the parent's key column. One ids-only anti-join —
    * the big-data shape of an FK check (broadcast when the parent's key
    * projection is small, shuffle otherwise; Catalyst picks).
    */
  def foreignKey(
      child: DataFrame, fkCol: String,
      parent: DataFrame, pkCol: String,
      name: String): DataFrame = {
    // ONE left join against the deduped parent keys serves both counts:
    // every child row survives exactly once (parent side is distinct),
    // orphans are the non-null fks with no match — no second scan, no
    // 1x1 cross join for the total.
    val matched = child.select(col(fkCol))
      .join(parent.select(col(pkCol).as(fkCol), lit(true).as("__hit")).distinct(),
        Seq(fkCol), "left")
    report(name,
      sum(when(col(fkCol).isNotNull && col("__hit").isNull, 1L).otherwise(0L)),
      count(lit(1)))(matched)
  }

  /** Out-of-range violations on a numeric column (inclusive bounds),
    * null passes (pair with [[notNull]] to reject nulls).
    */
  def inRange(df: DataFrame, c: String, lo: Column, hi: Column, name: String): DataFrame =
    report(name,
      sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L).otherwise(0L)),
      count(lit(1)))(df)

  /** Null violations. */
  def notNull(df: DataFrame, c: String, name: String): DataFrame =
    report(name, sum(when(col(c).isNull, 1L).otherwise(0L)), count(lit(1)))(df)

  /** Domain violations: non-null values outside the accepted set. */
  def acceptedValues(df: DataFrame, c: String, accepted: Seq[String], name: String): DataFrame =
    report(name,
      sum(when(col(c).isNotNull && !col(c).isin(accepted: _*), 1L).otherwise(0L)),
      count(lit(1)))(df)

  /** A suite is the union of its checks' one-row reports. */
  def suite(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_.unionAll(_))
}
