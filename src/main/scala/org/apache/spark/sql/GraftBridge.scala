package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Minimal bridge into Spark's `private[sql]` Column↔Expression conversion
 * (org.apache.spark.sql.classic.ExpressionUtils) so graft's custom Catalyst
 * expressions can expose a public Column API on Spark 4's ColumnNode-backed
 * Column. This is the standard extension-library pattern; no Spark internals
 * are modified.
 */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
