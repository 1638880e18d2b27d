package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** All `bands` sign-LSH bucket ids of a float vector in ONE fused pass:
  * element `k` of the result packs the sign bits of
  * `dot(vec, plane_{k·numPlanes+p})` for `p ∈ [0, numPlanes)` — the
  * banded OR-amplified index an LSH near-dup join explodes on.
  *
  * BIT-IDENTICAL to the composable Column form
  * `lshBucketFrom(vec, numPlanes, k·numPlanes)` per band
  * (`Similarity.lshBucketFrom`): plane component (p, d) =
  * `pmod(hash(p, d), 10007) / 10007.0 − 0.5` with Spark's seed-42
  * murmur3 fold, dot accumulated left-to-right in double, strict
  * `> 0` sign. The HOF form pays bands × planes interpreted
  * `zip_with`+`aggregate` passes per row (higher-order functions are
  * CodegenFallback), which made bucket computation — not the candidate
  * join — the dominant cost of the near-dup query; this computes the
  * whole band array in one codegen'd loop over a memoized plane table.
  *
  * Null array → null ([[nullIntolerant]]). A null ELEMENT → null
  * result — the one divergence from the HOF form (which nulls that
  * band's dot into a 0 bit); embeddings never carry null components,
  * so the divergence is unreachable through the operators.
  */
case class SignLshBands(child: Expression, numPlanes: Int, bands: Int)
    extends UnaryExpression {

  require(numPlanes > 0 && numPlanes < 31,
    s"numPlanes must be in [1, 30], got $numPlanes")
  require(bands > 0, s"bands must be positive, got $bands")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got $t")
    }

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def nullIntolerant: Boolean = true

  /** Can return null for non-null input (null elements). */
  override def nullable: Boolean = true

  override def prettyName: String = "sign_lsh_bands"

  override def nullSafeEval(a: Any): Any = {
    val r = SignLshBands.buckets(
      a.asInstanceOf[ArrayData], numPlanes, bands)
    if (r == null) null else new GenericArrayData(r)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("lshBands")
      s"""
         |final int[] $r = graft.functions.expressions.SignLshBands
         |  .buckets($a, $numPlanes, $bands);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions
         |    .UnsafeArrayData.fromPrimitiveArray($r);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SignLshBands = copy(child = newChild)
}

object SignLshBands {

  // plane components depend only on (globalPlane, dim): one table per
  // (totalPlanes, dims) shape per JVM, shared by every task thread —
  // O(totalPlanes · dims) doubles, recomputed never
  private val tables =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Double]]()

  /** Row-major [totalPlanes × dims] plane components, each
    * `pmod(hash(p, d), 10007) / 10007.0 − 0.5` under Spark's seed-42
    * murmur3 fold — the exact values `Similarity.lshBucketFrom`'s
    * Column algebra computes per row. */
  private def table(totalPlanes: Int, dims: Int): Array[Double] = {
    val key = totalPlanes.toLong << 32 | (dims & 0xffffffffL)
    val cached = tables.get(key)
    if (cached != null) return cached
    val t = new Array[Double](totalPlanes * dims)
    var p = 0
    while (p < totalPlanes) {
      val hp = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(p, 42)
      val base = p * dims
      var d = 0
      while (d < dims) {
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(d, hp)
        var m = h % 10007
        if (m < 0) m += 10007
        t(base + d) = m.toDouble / 10007.0 - 0.5
        d += 1
      }
      p += 1
    }
    tables.putIfAbsent(key, t)
    t
  }

  /** All band buckets of one vector; null on a null element (see class
    * doc). Called from both interpreted eval and generated code. */
  def buckets(x: ArrayData, numPlanes: Int, bands: Int): Array[Int] = {
    val dims = x.numElements()
    var i = 0
    while (i < dims) {
      if (x.isNullAt(i)) return null
      i += 1
    }
    val vec = x.toFloatArray()
    val tab = table(numPlanes * bands, dims)
    val out = new Array[Int](bands)
    var k = 0
    while (k < bands) {
      var bucket = 0
      var p = 0
      while (p < numPlanes) {
        val base = (k * numPlanes + p) * dims
        var dot = 0.0
        var d = 0
        while (d < dims) {
          dot += vec(d).toDouble * tab(base + d)
          d += 1
        }
        if (dot > 0) bucket |= 1 << p
        p += 1
      }
      out(k) = bucket
      k += 1
    }
    out
  }
}
