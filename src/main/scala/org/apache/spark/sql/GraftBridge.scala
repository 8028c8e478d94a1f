package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to Spark 4's private[sql] Column<->Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`), required to register
  * custom Catalyst expressions (e.g. graft.expressions.U60Hash) as
  * Columns without going through a FunctionRegistry extension. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
