package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import graft.SparkSpec
import graft.operators.Similarity

/** The native codegen CosineSimilarity must be bit-identical to the
  * composable HOF form, and handle the null/shape edge cases. */
class CosineSimilaritySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("a", ArrayType(FloatType)),
    StructField("b", ArrayType(FloatType))))

  private def df(rows: (Seq[Float], Seq[Float])*) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*), schema)

  test("codegen expression matches HOF form bit-for-bit on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val pairs = emb.crossJoin(broadcast(q))
    val both = pairs.select(
      Similarity.cosine(col("embedding"), col("qv")).as("fast"),
      Similarity.cosineHof(col("embedding"), col("qv")).as("ref"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"mismatch: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("known values") {
    val out = df((Seq(1f, 2f, 3f), Seq(2f, 3f, 4f)))
      .select(Similarity.cosine(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(out - 20.0 / (math.sqrt(14.0) * math.sqrt(29.0))) < 1e-15)
    val ortho = df((Seq(1f, 0f), Seq(0f, 1f)))
      .select(Similarity.cosine(col("a"), col("b"))).head().getDouble(0)
    assert(ortho == 0.0)
  }

  test("null array, null element, and length mismatch all yield null") {
    val rows = java.util.Arrays.asList(
      Row(null, Seq(1f, 2f)),
      Row(Seq(1f, 2f), Seq(1f, null, 3f)),
      Row(Seq(1f, 2f), Seq(1f, 2f, 3f)))
    val out = spark.createDataFrame(rows, schema)
      .select(Similarity.cosine(col("a"), col("b")).as("c")).collect()
    assert(out.forall(_.isNullAt(0)), out.mkString(","))
  }

  test("the expression participates in whole-stage codegen") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val d = emb.select(
      Similarity.cosine(col("embedding"), col("embedding")).as("c"))
    d.collect()
    val plan = d.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"fell out of codegen:\n$plan")
  }
}
