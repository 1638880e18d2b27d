package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Jaccard similarity |A∩B| / |A∪B| of two SORTED, DISTINCT
  * `array<string>` columns, as one fused merge loop.
  *
  * The composable form (`array_intersect` + `array_union` + two `size`s)
  * builds two intermediate hash sets and materializes two arrays per
  * comparison; for near-dup re-checking, the candidate pair volume makes
  * that the hot allocation site. This expression walks both sorted
  * arrays once with zero allocation inside whole-stage codegen.
  *
  * Contract: inputs must be sorted ascending (Spark's `sort_array`
  * binary UTF8 order — the same order `compareTo` uses here) and
  * duplicate-free ([[graft.operators.TextDedup.shingles]] guarantees
  * both). Null arrays or null elements yield null.
  */
case class SortedSetJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<string>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  /** Can return null for non-null inputs (null elements) — see the same
    * override in CosineSimilarity. */
  override def nullable: Boolean = true

  override def prettyName: String = "sorted_set_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements(); val nb = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { inter += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 1.0 else inter.toDouble / union.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val cmp = ctx.freshName("cmp")
      val union = ctx.freshName("union")
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $na && $j < $nb && !${ev.isNull}) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  final int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $inter++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |if (!${ev.isNull}) {
         |  final int $union = $na + $nb - $inter;
         |  ${ev.value} = $union == 0 ? 1.0 : (double) $inter / (double) $union;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedSetJaccard =
    copy(left = newLeft, right = newRight)
}
