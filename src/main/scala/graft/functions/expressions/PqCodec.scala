package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Fused codegen kernels for the product-quantization family
  * (optimization guide §1.2 step 2 / §4): the composable forms in
  * [[graft.operators.Similarity]] — `pqEncodeCol`'s nested
  * `aggregate`-over-`sequence` argmin, the Lloyd trainer's
  * `aggregate(zip_with(...))` L2², and `pqAdcScore`'s per-code LUT
  * fold — are per-element Catalyst lambda chains, paying interpreter
  * dispatch and boxed struct accumulators per vector element. Each
  * kernel here is one tight JVM loop, bit-identical to its composable
  * reference (PqCodecSpec pins the parity; the composable forms stay
  * in Similarity as the readable reference implementations).
  */

/** PQ encode: vector → its m nearest-sub-centroid codes under the
  * codebooks CONSTANT (plan literal, like the composable form's
  * `typedlit`). Exact reference semantics: per subspace, strict `<`
  * argmin over L2² in left-to-right double accumulation, ties to the
  * smallest code, and a malformed slice (missing elements / null
  * element — unreachable through the operators, which encode non-null
  * fixed-dim embeddings) degrades to code −1 exactly as the null-
  * propagating composable form does. Null INPUT returns null where
  * the composable form returns an all-−1 array — unreachable the same
  * way (documented divergence, the MinHashMins pattern). */
case class PqEncode(child: Expression,
                    codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks(0).nonEmpty &&
    codebooks(0)(0).nonEmpty, "codebooks must be m × ksub × dsub")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got $t")
    }

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "pq_encode"

  // the literal rides the EXPRESSION (one JVM object shared by every
  // row of the task), not the plan tree — the composable typedlit
  // form re-materializes the nested array per generated projection
  @transient private lazy val flat: PqCodec.Flat = PqCodec.flatten(codebooks)

  override def nullSafeEval(a: Any): Any =
    PqCodec.encode(a.asInstanceOf[ArrayData], flat)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqFlat", flat,
      classOf[PqCodec.Flat].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.expressions.PqCodec.encode($a, $ref);"
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqEncode = copy(child = newChild)
}

/** Σ (a_i − b_i)² in left-to-right double accumulation — the Lloyd
  * trainer's and drift monitor's distance kernel. Null on: null side,
  * length mismatch, or a null element (the composable
  * `aggregate(zip_with(...))` null-propagates identically). */
case class L2SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float>, got $l and $r")
    }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  /** Null for non-null inputs (length mismatch, null elements). */
  override def nullable: Boolean = true

  override def prettyName: String = "l2_squared"

  override def nullSafeEval(a: Any, b: Any): Any =
    PqCodec.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("l2")
      s"""
         |Object $r = graft.functions.expressions.PqCodec.l2sq($a, $b);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Double) $r).doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SquaredDistance =
    copy(left = newLeft, right = newRight)
}

/** ADC score: Σ_s lut[s·ksub + codes_s] — m array lookups per
  * candidate. Matches `pqAdcScore`'s fold exactly (left-to-right
  * double adds); null on null codes/lut or a null element; an
  * out-of-range code throws, as ANSI element_at would (unreachable:
  * codes come from the encode). */
case class PqAdcLookupScore(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  require(ksub > 0, s"ksub must be positive, got $ksub")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<int> codes and array<double> lut, " +
          s"got $l and $r")
    }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def nullable: Boolean = true

  override def prettyName: String = "pq_adc_score"

  override def nullSafeEval(a: Any, b: Any): Any =
    PqCodec.adc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], ksub)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("adc")
      s"""
         |Object $r = graft.functions.expressions.PqCodec.adc($a, $b, $ksub);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Double) $r).doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcLookupScore =
    copy(left = newLeft, right = newRight)
}

object PqCodec {

  /** Codebooks flattened row-major for cache-friendly scans:
    * `cents[(s·ksub + c)·dsub + j]`. Serializable — it rides generated
    * code as a reference object. */
  final class Flat(val m: Int, val ksub: Int, val dsub: Int,
                   val cents: Array[Float]) extends Serializable

  def flatten(cb: Array[Array[Array[Float]]]): Flat = {
    val m = cb.length; val ksub = cb(0).length; val dsub = cb(0)(0).length
    val flat = new Array[Float](m * ksub * dsub)
    var s = 0
    while (s < m) {
      require(cb(s).length == ksub, "ragged codebooks")
      var c = 0
      while (c < ksub) {
        require(cb(s)(c).length == dsub, "ragged codebook centroid")
        System.arraycopy(cb(s)(c), 0, flat, (s * ksub + c) * dsub, dsub)
        c += 1
      }
      s += 1
    }
    new Flat(m, ksub, dsub, flat)
  }

  /** See [[PqEncode]]. Called from interpreted eval and codegen. */
  def encode(x: ArrayData, f: Flat): ArrayData = {
    val n = x.numElements()
    val out = new Array[Int](f.m)
    var s = 0
    while (s < f.m) {
      val base = s * f.dsub
      // slice short of dsub elements, or a null element inside it,
      // null-propagates to code −1 in the composable form
      var usable = base + f.dsub <= n
      if (usable) {
        var j = 0
        while (usable && j < f.dsub) {
          if (x.isNullAt(base + j)) usable = false
          j += 1
        }
      }
      if (!usable) out(s) = -1
      else {
        var bestD = Double.MaxValue
        var bestC = -1
        var c = 0
        while (c < f.ksub) {
          val cbase = (s * f.ksub + c) * f.dsub
          var d = 0.0
          var j = 0
          while (j < f.dsub) {
            val diff = x.getFloat(base + j).toDouble -
              f.cents(cbase + j).toDouble
            d += diff * diff
            j += 1
          }
          if (d < bestD) { bestD = d; bestC = c }
          c += 1
        }
        out(s) = bestC
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** See [[L2SquaredDistance]]; null (as java.lang.Double) on length
    * mismatch or null elements. */
  def l2sq(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var d = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val diff = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      d += diff * diff
      i += 1
    }
    java.lang.Double.valueOf(d)
  }

  /** See [[PqAdcLookupScore]]. */
  def adc(codes: ArrayData, lut: ArrayData, ksub: Int): java.lang.Double = {
    val m = codes.numElements()
    var sum = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val idx = s * ksub + codes.getInt(s)
      if (idx < 0 || idx >= lut.numElements())
        throw new ArrayIndexOutOfBoundsException(
          s"pq_adc_score: code ${codes.getInt(s)} of subspace $s " +
            s"indexes past the ${lut.numElements()}-entry LUT")
      if (lut.isNullAt(idx)) return null
      sum += lut.getDouble(idx)
      s += 1
    }
    java.lang.Double.valueOf(sum)
  }
}
