package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The full winnowing fingerprint set of a (normalized) text, fused
  * into one expression: rolling char `k`-gram md5s, sliding-window
  * minima over `w` consecutive grams, distinct, ascending — exactly
  * `sort_array(array_distinct(winnow(charGramHashesOfNorm(norm, k), w)))`
  * from [[graft.functions.TextAnalysis]] (the composable reference
  * form, which WinnowFingerprintsSpec pins this against).
  *
  * Why fused (optimization guide §1.2 step 2 / §4): the composable form
  * evaluates a Catalyst lambda per character position, materializes an
  * O(n) array of 32-char hex STRINGS per document, then re-walks it
  * with a per-window `slice` + `array_min` lambda pair — per-element
  * interpreter dispatch and two generations of string garbage per
  * character of corpus text. This pays one tight loop per document:
  * md5 over the gram's UTF-8 byte slice directly (one thread-local
  * MessageDigest, no hex), window minima over 16-byte digests with a
  * monotonic deque (unsigned byte order on the digest IS the
  * lexicographic order of its lowercase hex — the encoding is
  * monotone), and hex-encodes only the SURVIVING distinct minima
  * (≈ 2/w of the grams).
  *
  * Grams are codepoint-windows (UTF8String substring semantics, so
  * multi-byte text matches `substr(i, k)` exactly). n < k degenerates
  * to one whole-text gram and m < w to the single global minimum,
  * matching the composable form's `otherwise` branches. Null input →
  * null; the normalized text is never null-elemented (it is a string).
  */
case class WinnowMd5Fingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k > 0, s"gram size k must be positive, got $k")
  require(w > 0, s"window size w must be positive, got $w")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got $t")
    }

  // containsNull matches the composable reference form (transform
  // lambdas type their elements nullable), so the declared entry
  // schema is bit-identical either way
  override def dataType: DataType =
    ArrayType(StringType, containsNull = true)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "winnow_md5_fingerprints"

  override def nullSafeEval(a: Any): Any =
    WinnowMd5Fingerprints.fingerprints(a.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.expressions.WinnowMd5Fingerprints
         |  .fingerprints($a, $k, $w);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): WinnowMd5Fingerprints = copy(child = newChild)
}

object WinnowMd5Fingerprints {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) & 0xf0) >>> 4).toByte
      out(2 * i + 1) = hexChars(d(i) & 0x0f).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned lexicographic byte order on equal-length digests — the
    * same total order as comparing their lowercase-hex encodings
    * (each byte maps monotonically to two hex chars). */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val digestOrder = new java.util.Comparator[Array[Byte]] {
    override def compare(a: Array[Byte], b: Array[Byte]): Int = {
      var i = 0
      while (i < 16) {
        val x = a(i) & 0xff; val y = b(i) & 0xff
        if (x != y) return x - y
        i += 1
      }
      0
    }
  }

  /** Called from both interpreted eval and generated code. */
  def fingerprints(norm: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = norm.getBytes
    // codepoint start offsets (UTF8String numChars/substring semantics)
    var n = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) n += 1
      i += 1
    }
    val starts = new Array[Int](n + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(n) = bytes.length
    val md = md5.get()
    def gram(from: Int, to: Int): Array[Byte] = {
      md.reset()
      md.update(bytes, starts(from), starts(to) - starts(from))
      md.digest()
    }
    val m = if (n >= k) n - k + 1 else 1
    if (n < k) {
      // single whole-text gram; its min is itself
      return new GenericArrayData(Array[Any](hex(gram(0, n))))
    }
    val sorted = new java.util.TreeSet[Array[Byte]](digestOrder)
    if (m < w) {
      // one global minimum over all grams
      var best = gram(0, k)
      var j = 1
      while (j < m) {
        val g = gram(j, j + k)
        if (less(g, best)) best = g
        j += 1
      }
      sorted.add(best)
    } else {
      // monotonic deque of gram indices, digests cached per position
      val digests = new Array[Array[Byte]](m)
      var j = 0
      while (j < m) { digests(j) = gram(j, j + k); j += 1 }
      val deque = new Array[Int](m)
      var head = 0; var tail = 0 // [head, tail)
      j = 0
      while (j < m) {
        while (tail > head && !less(digests(deque(tail - 1)), digests(j)))
          tail -= 1
        deque(tail) = j; tail += 1
        if (deque(head) <= j - w) head += 1
        if (j >= w - 1) sorted.add(digests(deque(head)))
        j += 1
      }
    }
    val out = new Array[Any](sorted.size)
    val it = sorted.iterator()
    var o = 0
    while (it.hasNext) { out(o) = hex(it.next()); o += 1 }
    new GenericArrayData(out)
  }
}
