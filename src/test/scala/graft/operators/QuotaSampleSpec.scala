package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Two-level salted quota cap == the single-window reference, at any
  * salt count, with exact per-group sizes. */
class QuotaSampleSpec extends SparkSpec {

  import spark.implicits._

  private def fixture = (0L until 500L)
    .map(i => (i, s"g${i % 7}")).toDF("id", "grp")

  test("two-level cap is row-identical to the single-window form for " +
      "every salt count") {
    val df = fixture
    val w = Window.partitionBy("grp")
      .orderBy(md5(col("id").cast("string")), col("id"))
    val want = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 20).drop("rk")
      .collect().map(_.getLong(0)).sorted.toSeq
    for (salts <- Seq(1, 2, 16, 64)) {
      val got = QuotaSample.cap(df, "grp", "id", quota = 20, salts = salts)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == want, s"salts=$salts diverged from the single window")
    }
  }

  test("groups under quota keep every row; groups over it keep exactly " +
      "the quota") {
    val skewed = ((0L until 300L).map(i => (i, "big")) ++
      (1000L until 1005L).map(i => (i, "small"))).toDF("id", "grp")
    val sizes = QuotaSample.cap(skewed, "grp", "id", quota = 50)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map("big" -> 50L, "small" -> 5L))
  }

  test("the cap is deterministic across shuffles and re-runs") {
    val df = fixture.repartition(13)
    val a = QuotaSample.cap(df, "grp", "id", 10).collect()
      .map(_.getLong(0)).sorted.toSeq
    val b = QuotaSample.cap(fixture.repartition(3), "grp", "id", 10)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }
}
