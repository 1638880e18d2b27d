package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.{internal => sqlnode}

/** Bridge into `private[sql]` Column↔Expression conversion for custom
  * Catalyst expressions (Spark 4 wraps Column around ColumnNode; the
  * classic converter lives behind the sql package boundary). This is the
  * one sanctioned touch-point — everything else in the engine stays on
  * public API. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Neutral view of a Column's unresolved node tree, for syntactic
    * predicate analysis OUTSIDE the sql package (the ColumnNode API is
    * `private[sql]`). Anything but a function / attribute / literal
    * maps to [[Opaque]] — callers must treat it as unanalyzable. */
  sealed trait PredNode
  final case class Fn(name: String, args: Seq[PredNode]) extends PredNode
  final case class Attr(name: String) extends PredNode
  final case class Lit(value: Any,
      dataType: Option[org.apache.spark.sql.types.DataType]) extends PredNode
  case object Opaque extends PredNode

  def predTree(c: Column): PredNode = toPred(c.node)

  private def toPred(n: sqlnode.ColumnNode): PredNode = n match {
    case f: sqlnode.UnresolvedFunction =>
      Fn(f.functionName, f.arguments.map(toPred))
    case a: sqlnode.UnresolvedAttribute => Attr(a.nameParts.mkString("."))
    case l: sqlnode.Literal => Lit(l.value, l.dataType)
    case _ => Opaque
  }
}
