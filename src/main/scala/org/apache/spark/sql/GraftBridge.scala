package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the classic Column ↔ Expression converters, which are
  * `private[sql]` in Spark 4 (Column is Connect-neutral there). This is the
  * standard extension-library pattern for exposing custom Catalyst
  * expressions as user-facing Columns. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
