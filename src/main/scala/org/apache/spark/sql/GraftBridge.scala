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

  /** Bounded read of an [[Observation]]'s metrics (`Observation.future` is
    * `private[sql]`): Some(row) if the observed action's metrics arrived
    * within `timeoutMs`, else None. Lets callers fuse a convergence count
    * into an eager localCheckpoint job and still degrade gracefully if the
    * metrics listener misses the action. */
  def observationRow(obs: Observation, timeoutMs: Long): Option[Row] =
    try Some(scala.concurrent.Await.result(obs.future,
      scala.concurrent.duration.Duration(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)))
    catch { case _: java.util.concurrent.TimeoutException => None }
}
