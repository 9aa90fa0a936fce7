package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column<->Expression conversion, for graft's
  * native expressions (the same technique community libraries use to
  * expose custom Catalyst expressions as Columns without forcing every
  * session to carry a SparkSessionExtensions registration).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Literal Column from a Scala value + EXPLICIT schema — the
    * reflection-free alternative to `typedLit` (whose runtime TypeTag
    * resolution silently falls back to an untyped Literal under REPL
    * classloaders) and to `Literal.create(v, dt)` (whose type-agnostic
    * converter leaves nested Products unconverted). The schema-driven
    * converter handles tuples/Seqs at every nesting level.
    */
  def literal(v: Any, dt: org.apache.spark.sql.types.DataType): Column =
    column(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToCatalystConverter(dt)(v), dt))
}
