package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Narrow doorway into `private[sql]` Column↔Expression plumbing for
  * graft's native expressions (Spark 4 moved `Column.expr` and
  * `Column(expr)` behind `classic.ExpressionUtils`). Used where a
  * Column builder needs to emit a native expression WITHOUT requiring
  * the session-level function registry to be installed first (e.g.
  * [[graft.llm.TextMetrics.clippedOverlap]], which is called from
  * gates, finetune paths, and specs alike). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
