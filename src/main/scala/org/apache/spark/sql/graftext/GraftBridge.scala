package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion for custom
  * Catalyst expressions (Spark 4 wraps Column around ColumnNode; the
  * classic converter lives behind the sql package boundary). This is the
  * one sanctioned touch-point — everything else in the engine stays on
  * public API. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
