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
}
