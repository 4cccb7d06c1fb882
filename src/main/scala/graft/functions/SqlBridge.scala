package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal access bridge: `ExpressionUtils.column` (the Spark 4 way to
  * wrap a custom Catalyst Expression as a user-facing Column) is
  * `private[sql]`, so the engine exposes it from inside the package —
  * the standard extension idiom, no internals copied. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
