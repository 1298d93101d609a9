package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-private bridge: Column ↔ Expression conversion lives behind
  * `private[sql]` in Spark 4 (classic.ExpressionUtils); custom Catalyst
  * expressions (graft.functions.CosineSimExpr) need both directions to
  * expose a Column API. This is the standard extension-point shim — no
  * Spark internals are modified.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
