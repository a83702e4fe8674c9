package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column <-> Expression conversion (the
  * Spark 4 Column is a ColumnNode wrapper; `classic.ExpressionUtils` holds
  * the converters but is private[sql]). Used only by graft.functions to
  * expose custom Catalyst expressions as Columns.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
