package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the classic Column ↔ Expression converters, which are
  * `private[sql]` in Spark 4 (Column is Connect-neutral there). This is the
  * standard extension-library pattern for exposing custom Catalyst
  * expressions as user-facing Columns. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Release the block-manager blocks behind a `localCheckpoint()`ed frame.
    * Checkpoint blocks are otherwise reclaimed only by the GC-driven
    * ContextCleaner (periodic GC defaults to 30 min), so an iterative
    * fixpoint that checkpoints per round leaks every intermediate frontier
    * for the life of the session. The frame must not be used afterwards —
    * its lineage was truncated, so the data is unrecoverable. */
  def freeCheckpoint(df: Dataset[_]): Unit =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed.foreach {
      case lr: execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _                        => ()
    }
}
