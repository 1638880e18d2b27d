package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("each left row gets the latest right row at-or-before its time") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:00:20"), "t2"),
      (2L, ts("2024-01-01 10:00:10"), "t3"))
      .toDF("sym", "t", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, 9.0),
      (1L, ts("2024-01-01 10:00:10"), 101L, 9.5),
      (2L, ts("2024-01-01 10:00:10"), 200L, 5.0), // equal time: matches (≤)
      (2L, ts("2024-01-01 10:00:30"), 201L, 6.0)) // future: never matches t3
      .toDF("sym", "t", "qid", "px")
    val out = AsOfJoin.lastPriorMatch(trades, quotes,
      "sym", "sym", col("t"), col("t"), "qid", Seq("qid", "px"))
      .select($"trade", $"__match.qid", $"__match.px")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set(("t1", 100L, 9.0), ("t2", 101L, 9.5), ("t3", 200L, 5.0)))
  }

  test("left rows with no prior right row get null; equal-time ties take the larger tiebreak") {
    val left = Seq((1L, ts("2024-01-01 09:00:00"), "early"),
      (1L, ts("2024-01-01 11:00:00"), "late")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5L, 1.0),
      (1L, ts("2024-01-01 10:00:00"), 9L, 2.0)) // same time, tie -> qid 9
      .toDF("k", "t", "qid", "px")
    val out = AsOfJoin.lastPriorMatch(left, right,
      "k", "k", col("t"), col("t"), "qid", Seq("qid", "px"))
      .select($"tag", $"__match.qid").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out == Map("early" -> -1L, "late" -> 9L))
  }

  test("plan: one shuffle on the key, no cartesian/nested-loop") {
    val left = spark.range(100).select(($"id" % 5).as("k"),
      timestamp_seconds($"id" * 60).as("t"), $"id".as("lid"))
    val right = spark.range(50).select(($"id" % 5).as("k"),
      timestamp_seconds($"id" * 100).as("t"), $"id".as("rid"), lit(1.0).as("v"))
    val df = AsOfJoin.lastPriorMatch(left, right, "k", "k",
      col("t"), col("t"), "rid", Seq("rid", "v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of join fell back to a product:\n$plan")
  }
}
