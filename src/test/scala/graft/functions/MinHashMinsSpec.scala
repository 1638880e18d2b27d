package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.TextDedup

/** The fused MinHash signature must be BIT-IDENTICAL to the composable
  * HOF form — the fusion relies on Spark's multi-arg hash(s, i) folding
  * left (string hashed once, i int-hashed with that digest as seed), so
  * any drift in that assumption shows up here. */
class MinHashMinsSpec extends SparkSpec {

  import spark.implicits._

  test("fused signature matches the per-hash-function HOF form on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
      .withColumn("sh", TextDedup.shingles($"text"))
    val both = docs.select(
      TextDedup.minhashSignatureOfShingles($"sh").as("fused"),
      TextDedup.minhashSignatureOfShinglesHof($"sh").as("ref"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Integer](0) == r.getSeq[Integer](1),
        s"fused ${r.getSeq[Integer](0).take(4)}... vs ref ${r.getSeq[Integer](1).take(4)}...")
    }
  }

  test("empty shingle set gives an all-null signature, like array_min(empty)") {
    val out = Seq(Tuple1(Seq.empty[String])).toDF("sh")
      .select(TextDedup.minhashSignatureOfShingles($"sh", numHashes = 8))
      .head().getSeq[Integer](0)
    assert(out.size == 8 && out.forall(_ == null))
  }

  test("SQL registration via extension") {
    val prior = graft.SparkSpec.session
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]").withExtensions(new graft.GraftExtensions).getOrCreate()
      val v = s.sql("SELECT minhash_mins(array(7), 4)").head().getSeq[Integer](0)
      assert(v.size == 4 && v.forall(_ != null))
      // a foldable NULL int literal passes the type guard but must get
      // the same "int literal" rejection, not an unboxing NPE
      val e = intercept[Exception](
        s.sql("SELECT minhash_mins(array(7), CAST(NULL AS INT))").head())
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("must be an int literal")),
        s"wrong error: $e")
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(prior)
      org.apache.spark.sql.SparkSession.setActiveSession(prior)
    }
  }

  test("the expression participates in whole-stage codegen") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(5)
      .withColumn("sh", TextDedup.shingles($"text"))
      .select(TextDedup.minhashSignatureOfShingles($"sh").as("sig"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen span in plan:\n$plan")
  }
}
