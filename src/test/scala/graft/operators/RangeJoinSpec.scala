package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  test("binned range join equals the naive theta join") {
    val points = spark.range(0, 200)
      .select($"id".as("pid"), ($"id" * 7 % 100).cast("double").as("v"))
    val intervals = spark.range(0, 30)
      .select($"id".as("iid"), ($"id" * 3).cast("double").as("lo"),
        ($"id" * 3 + 10).cast("double").as("hi"))
    val naive = points.join(intervals,
      $"v" >= $"lo" && $"v" <= $"hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val binned = RangeJoin.pointInInterval(points, intervals,
      "v", "lo", "hi", binWidth = 8.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive)
    assert(naive.nonEmpty)
  }

  test("boundary inclusivity: lo and hi both match") {
    val points = Seq((1L, 10.0), (2L, 20.0), (3L, 9.99), (4L, 20.01))
      .toDF("pid", "v")
    val intervals = Seq((1L, 10.0, 20.0)).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", 5.0)
      .select("pid").as[Long].collect().toSet
    assert(out == Set(1L, 2L))
  }

  test("negative values bin correctly (floor semantics)") {
    val points = Seq((1L, -7.5), (2L, -0.1), (3L, 0.1)).toDF("pid", "v")
    val intervals = Seq((1L, -10.0, 0.0)).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", 4.0)
      .select("pid").as[Long].collect().toSet
    assert(out == Set(1L, 2L))
  }

  test("plan: equi-join on bin, not a nested-loop product") {
    val points = spark.range(100).select($"id".as("pid"), $"id".cast("double").as("v"))
    val intervals = spark.range(10).select($"id".as("iid"),
      ($"id" * 10).cast("double").as("lo"), ($"id" * 10 + 9).cast("double").as("hi"))
    val plan = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a product:\n$plan")
  }
}
