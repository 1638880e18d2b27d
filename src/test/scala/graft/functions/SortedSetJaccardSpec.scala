package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.TextDedup

class SortedSetJaccardSpec extends SparkSpec {

  import spark.implicits._

  test("matches the array_intersect/array_union formula on real shingles") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(100)
      .select($"doc_id", TextDedup.shingles($"text").as("sh"))
      .persist()
    val pairs = docs.select($"doc_id".as("idA"), $"sh".as("shA"))
      .crossJoin(docs.select($"doc_id".as("idB"), $"sh".as("shB")))
      .filter($"idA" < $"idB").limit(500)
    val both = pairs.select(
      TextDedup.jaccard($"shA", $"shB").as("fused"),
      (size(array_intersect($"shA", $"shB")).cast("double") /
        size(array_union($"shA", $"shB")).cast("double")).as("ref"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("edge cases: identical, disjoint, empty, null") {
    val df = Seq(
      (Seq("a", "b"), Seq("a", "b")),
      (Seq("a", "b"), Seq("c", "d")),
      (Seq.empty[String], Seq.empty[String]))
      .toDF("a", "b")
    val out = df.select(TextDedup.jaccard($"a", $"b")).collect()
      .map(_.getDouble(0)).toSeq
    assert(out == Seq(1.0, 0.0, 1.0))
    val n = Seq((Seq("a"), null: Seq[String])).toDF("a", "b")
      .select(TextDedup.jaccard($"a", $"b")).head()
    assert(n.isNullAt(0))
  }

  test("SQL registration via extension") {
    val prior = graft.SparkSpec.session
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]").withExtensions(new graft.GraftExtensions).getOrCreate()
      val v = s.sql("SELECT sorted_set_jaccard(array('a','b','c'), array('b','c','d'))")
        .head().getDouble(0)
      assert(v == 0.5)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(prior)
      org.apache.spark.sql.SparkSession.setActiveSession(prior)
    }
  }
}
