package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ⇄ Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils) so graft's native Catalyst
  * expressions can be exposed as user-facing Columns. Spark 4 moved Column to
  * ColumnNode internals; this is the supported classic-mode conversion path.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
