package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit SimHash of a token-hash column (`array<long>`), as one fused
  * loop: every token votes +1/−1 on each of the 64 bits; bit b of the
  * result is set iff its vote total is positive.
  *
  * The composable form ([[graft.operators.TextDedup.simhashOfHashesHof]])
  * unrolls 64 separate `aggregate` passes over the array — O(64·tokens)
  * interpreted lambda calls per document (measured: 8.9s for the sf0.1
  * corpus, 45% of it this expression tree). This expression keeps a
  * single 64-slot counter array (a reused mutable buffer, zero per-row
  * allocation) and walks the hashes once inside whole-stage codegen.
  *
  * Empty array → 0L (all votes zero), matching the HOF form. Null array
  * or null element → null.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got $t")
    }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  /** Can return null for non-null input (null elements) — see the same
    * override in CosineSimilarity. */
  override def nullable: Boolean = true

  override def prettyName: String = "simhash64"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val h = x.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val votes = ctx.addMutableState("int[]", "simhashVotes",
      v => s"$v = new int[64];")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |java.util.Arrays.fill($votes, 0);
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $votes[$b] += (($h >>> $b) & 1L) == 1L ? 1 : -1;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long $out = 0L;
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ($votes[$b] > 0) $out |= (1L << $b);
         |  }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
