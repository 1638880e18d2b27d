package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.GraftBridge
import graft.SparkSpec
import graft.functions.expressions.SignLshBands
import graft.operators.Similarity

/** The fused banded-LSH bucket array must be BIT-IDENTICAL to the
  * per-band composable form (`lshBucketFrom`): same seed-42 murmur3
  * plane fold, same left-to-right double dot, same strict `> 0`
  * sign — any drift silently changes candidate recall. */
class SignLshBandsSpec extends SparkSpec {

  import spark.implicits._

  private def fused(numPlanes: Int, bands: Int) =
    GraftBridge.column(SignLshBands(
      GraftBridge.expression($"embedding"), numPlanes, bands))

  test("fused band array matches per-band lshBucketFrom on real embeddings") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").limit(100)
    for ((planes, bands) <- Seq((8, 16), (12, 24), (1, 1))) {
      val both = emb.select(
        fused(planes, bands).as("f"),
        array((0 until bands).map(k =>
          Similarity.lshBucketFrom($"embedding", planes, k * planes)): _*)
          .as("ref"))
        .collect()
      assert(both.nonEmpty)
      both.foreach { r =>
        assert(r.getSeq[Int](0) == r.getSeq[Int](1),
          s"($planes,$bands): fused ${r.getSeq[Int](0).take(4)}... " +
            s"vs ref ${r.getSeq[Int](1).take(4)}...")
      }
    }
  }

  test("interpreted eval agrees with codegen") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").limit(20)
    val viaCodegen = emb.select(fused(8, 4).as("b")).collect()
      .map(_.getSeq[Int](0))
    val viaEval = emb.collect().map { r =>
      val vec = r.getSeq[Float](r.fieldIndex("embedding"))
      SignLshBands.buckets(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          vec.toArray), 8, 4).toSeq
    }
    assert(viaCodegen.map(_.toSeq).toSeq == viaEval.map(_.toSeq).toSeq)
  }

  test("a null vector element nulls the whole band array") {
    val df = Seq(Tuple1(Seq[java.lang.Float](1.0f, null, 2.0f)))
      .toDF("embedding")
      .withColumn("embedding", $"embedding".cast("array<float>"))
    assert(df.select(fused(4, 2)).head().isNullAt(0))
  }
}
