package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Similarity

/** The fused PQ kernels (PqEncode / L2SquaredDistance /
  * PqAdcLookupScore) must be BIT-IDENTICAL to their composable
  * reference forms on real embeddings — the encode's strict-`<` tie
  * break, the left-to-right double accumulation, and the ADC LUT
  * indexing each silently change ANN candidates if they drift. */
class PqCodecSpec extends SparkSpec {

  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select($"vec_id", $"embedding")

  private lazy val cb = Similarity.pqTrainCodebooks(
    emb, m = 8, ksub = 16, iters = 1)

  test("fused encode matches the composable argmin on real embeddings") {
    val rows = emb.select(
      Similarity.pqEncodeCol($"embedding", cb).as("f"),
      Similarity.pqEncodeColRef($"embedding", cb).as("ref")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Int](0) == r.getSeq[Int](1)))
  }

  test("fused L2 squared matches aggregate(zip_with) exactly") {
    import org.apache.spark.sql.graftext.GraftBridge
    def fused(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      GraftBridge.column(graft.functions.expressions.L2SquaredDistance(
        GraftBridge.expression(a), GraftBridge.expression(b)))
    def ref(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }), lit(0.0), (acc, v) => acc + v)
    // self-join a shifted copy for varied pairs
    val pairs = emb.limit(50).crossJoin(
      emb.limit(7).select($"embedding".as("other")))
    val rows = pairs.select(
      fused($"embedding", $"other").as("f"),
      ref($"embedding", $"other").as("ref")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // bit-identical doubles, not approximate: same fold order
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // length mismatch and null element null-propagate like zip_with
    val odd = Seq(
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f)),
      (Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    odd.select(fused($"a", $"b").as("f"), ref($"a", $"b").as("ref"))
      .collect().foreach { r =>
        assert(r.isNullAt(0) && r.isNullAt(1))
      }
  }

  test("fused ADC score matches the composable LUT fold") {
    val codes = emb.select($"vec_id",
      Similarity.pqEncodeCol($"embedding", cb).as("codes"))
    val withLut = emb.limit(20).select($"vec_id",
        Similarity.pqLutCol($"embedding", cb).as("lut"))
      .crossJoin(codes.limit(40).select($"codes"))
    val rows = withLut.select(
      Similarity.pqAdcScore($"codes", $"lut", 16).as("f"),
      Similarity.pqAdcScoreRef($"codes", $"lut", 16).as("ref")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("interpreted eval agrees with codegen for the encode") {
    val viaCodegen = emb.limit(10)
      .select(Similarity.pqEncodeCol($"embedding", cb)).collect()
      .map(_.getSeq[Int](0))
    val flat = graft.functions.expressions.PqCodec.flatten(cb)
    val viaEval = emb.limit(10).collect().map { r =>
      graft.functions.expressions.PqCodec.encode(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          r.getSeq[Float](1).toArray), flat)
        .toIntArray().toSeq
    }
    assert(viaCodegen.map(_.toSeq).toSeq == viaEval.map(_.toSeq).toSeq)
  }
}
