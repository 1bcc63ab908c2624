package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Expression↔Column conversion, so the
  * engine's native Catalyst expressions (graft.plans.*) can be exposed as
  * ordinary `Column`s. The usual alternative — registering through the
  * session FunctionRegistry and round-tripping through `expr(...)` strings
  * — loses type safety for no benefit.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
