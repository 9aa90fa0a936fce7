package graft.plans

import org.apache.spark.sql.DataFrame

/** Plan introspection (T6).
  *
  * Reference capability: `compilePlanSql(...).printJsonString()` and
  * `env.getExecutionPlan()` (flink playground
  * `WithDeduplicateJoinJob.java:86-106`, `WithStateTtlJob.java:96`,
  * `CrossJoinJob.java:77`) — the author dumps the planner's physical
  * plan as JSON to inspect operator choices.
  *
  * Spark mapping: Catalyst exposes every plan stage; `explainJson` emits
  * the optimized logical plan as JSON (stable, machine-readable),
  * `explainFormatted` the physical plan as text (the human-facing view
  * with PushedFilters / WholeStageCodegen spans). Plan *pinning* (Flink's
  * CompiledPlan restore) is a non-goal: Spark re-plans per run, and
  * streaming restart compatibility is carried by the checkpoint dir
  * (SURVEY §3.3).
  */
object Pipeline {

  implicit final class RichPlan(private val df: DataFrame) extends AnyVal {

    /** Optimized logical plan as a JSON array of node objects. */
    def explainJson(): String = df.queryExecution.optimizedPlan.toJSON

    /** Physical plan, formatted (PushedFilters, codegen spans, exchanges). */
    def explainFormatted(): String = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }
}
