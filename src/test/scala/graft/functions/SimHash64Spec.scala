package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.TextDedup

class SimHash64Spec extends SparkSpec {

  import spark.implicits._

  test("fused expression matches the 64-pass HOF form on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
      .withColumn("th", TextDedup.tokenHashes($"text"))
    val both = docs.select(
      TextDedup.simhashOfHashes($"th").as("fused"),
      TextDedup.simhashOfHashesHof($"th").as("ref"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"${r.getLong(0)} vs ${r.getLong(1)}")
    }
  }

  test("edge cases: empty array is 0, null array and null element are null") {
    val out = Seq(Tuple1(Seq.empty[Long]))
      .toDF("h").select(TextDedup.simhashOfHashes($"h")).head()
    assert(out.getLong(0) == 0L)
    val nullArr = Seq(Tuple1(null: Seq[Long]))
      .toDF("h").select(TextDedup.simhashOfHashes($"h")).head()
    assert(nullArr.isNullAt(0))
    val nullElem = Seq(Tuple1(Seq[java.lang.Long](1L, null)))
      .toDF("h").select(TextDedup.simhashOfHashes($"h")).head()
    assert(nullElem.isNullAt(0))
  }

  test("single token sets exactly its hash's bits") {
    // one token: every set bit votes +1, every clear bit votes -1
    val h = 0x0123456789ABCDEFL
    val out = Seq(Tuple1(Seq(h))).toDF("h")
      .select(TextDedup.simhashOfHashes($"h")).head().getLong(0)
    assert(out == h)
  }

  test("the expression participates in whole-stage codegen") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(5)
      .withColumn("th", TextDedup.tokenHashes($"text"))
      .select(TextDedup.simhashOfHashes($"th").as("sh"))
    df.collect() // force execution so codegen spans materialize
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(") , s"no codegen span in plan:\n$plan")
  }

  test("SQL registration via extension") {
    val prior = graft.SparkSpec.session
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]").withExtensions(new graft.GraftExtensions).getOrCreate()
      val v = s.sql("SELECT simhash64(array(CAST(5 AS BIGINT)))")
        .head().getLong(0)
      assert(v == 5L)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(prior)
      org.apache.spark.sql.SparkSession.setActiveSession(prior)
    }
  }
}
