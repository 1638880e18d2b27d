package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** MinHash signature from an array of per-shingle hash seeds, fused
  * into one loop: element `i` of the result is the minimum over all
  * shingles of `murmur3_int(i, seed = hash(shingle))`.
  *
  * This is BIT-IDENTICAL to the composable form
  * `transform(sequence(0, n-1), i -> array_min(transform(sh, s -> hash(s, i))))`
  * because Spark's multi-argument `hash(s, i)` folds left: it hashes the
  * string once (seed 42) and then int-hashes `i` with that digest as
  * the seed — so the string needs hashing ONCE, not once per hash
  * function. The composable form pays O(numHashes · |shingle|) string
  * murmurs per document; this pays O(|shingles|) string murmurs (done
  * by the caller via `hash(s)`) plus O(numHashes) 5-op int murmurs per
  * shingle, all inside whole-stage codegen.
  *
  * Empty input array → an all-null signature (matching
  * `array_min(empty) = null`). Null array or null element → null — the
  * one intentional divergence from the HOF form, which maps a null
  * ARRAY to `[null × numHashes]`; `shingles()` never yields null, so
  * the divergence is unreachable through the dedup operators.
  */
case class MinHashMins(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<int>, got $t")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)

  override def nullIntolerant: Boolean = true

  /** Can return null for non-null input (null elements). */
  override def nullable: Boolean = true

  override def prettyName: String = "minhash_mins"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes))
    val mins = new Array[Int](numHashes)
    java.util.Arrays.fill(mins, Int.MaxValue)
    var j = 0
    while (j < n) {
      if (x.isNullAt(j)) return null
      val seed = x.getInt(j)
      var i = 0
      while (i < numHashes) {
        val v = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(i, seed)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mins = ctx.addMutableState("int[]", "minhashMins",
      v => s"$v = new int[$numHashes];")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val seed = ctx.freshName("seed")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    new Object[$numHashes]);
         |} else {
         |  java.util.Arrays.fill($mins, Integer.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    final int $seed = $a.getInt($j);
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      final int $v = org.apache.spark.unsafe.hash.Murmur3_x86_32
         |        .hashInt($i, $seed);
         |      if ($v < $mins[$i]) $mins[$i] = $v;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions
         |      .UnsafeArrayData.fromPrimitiveArray($mins);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashMins =
    copy(child = newChild)
}
