package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the classic Column ⇄ Catalyst Expression converters, which
  * are `private[sql]` since Spark 4 moved Column onto ColumnNode. Custom
  * native expressions (graft.functions.DotProduct) need exactly these
  * two calls and nothing else from the internal API; isolating them here
  * keeps the rest of the codebase on public surfaces only. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
