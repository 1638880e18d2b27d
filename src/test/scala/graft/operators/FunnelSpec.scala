package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Funnel semantics on a hand-built fixture: strict ordering, same-ts
  * non-conversion, out-of-order steps, and partial depth. */
class FunnelSpec extends SparkSpec {

  import spark.implicits._

  private def ts(sec: Int) = java.sql.Timestamp.valueOf(
    s"2020-01-01 00:00:${"%02d".format(sec)}")

  test("reach counts honor strict ordering per user") {
    val events = Seq(
      // user 1: full funnel in order
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      // user 2: click BEFORE the first view -> depth 1 only
      (2L, ts(1), "click"), (2L, ts(2), "view"),
      // user 3: click at the SAME instant as the view -> not strictly after
      (3L, ts(1), "view"), (3L, ts(1), "click"),
      // user 4: never views -> depth 0
      (4L, ts(1), "purchase"),
      // user 5: view, noise, late click, but purchase precedes click
      (5L, ts(1), "view"), (5L, ts(2), "error"),
      (5L, ts(3), "purchase"), (5L, ts(4), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.steps(events, "user_id", col("ts"), "event_type",
      Seq("view", "click", "purchase"))
      .as[(String, Long)].collect().toMap
    assert(out == Map("view" -> 4L, "click" -> 2L, "purchase" -> 1L), out.toString)
  }

  test("conversion window: steps outside the anchor window don't convert") {
    val events = Seq(
      // user 1: full funnel inside a 10s window
      (1L, ts(1), "view"), (1L, ts(4), "click"), (1L, ts(9), "purchase"),
      // user 2: click lands AFTER the window closes -> depth 1
      (2L, ts(1), "view"), (2L, ts(15), "click"),
      // user 3: click inside, purchase outside -> depth 2
      (3L, ts(1), "view"), (3L, ts(5), "click"), (3L, ts(20), "purchase"),
      // user 4: window is anchored at the FIRST view — a later re-entry
      // does not re-open it
      (4L, ts(1), "view"), (4L, ts(20), "view"),
      (4L, ts(22), "click"), (4L, ts(24), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.stepsWithin(events, "user_id", col("ts"), "event_type",
      Seq("view", "click", "purchase"), windowSeconds = 10)
      .as[(String, Long)].collect().toMap
    assert(out == Map("view" -> 4L, "click" -> 2L, "purchase" -> 1L), out.toString)
    // sanity: the unwindowed fold converts users 2-4 deeper
    val un = Funnel.steps(events, "user_id", col("ts"), "event_type",
      Seq("view", "click", "purchase"))
      .as[(String, Long)].collect().toMap
    assert(un == Map("view" -> 4L, "click" -> 4L, "purchase" -> 3L), un.toString)
  }

  test("duplicate step types are rejected") {
    val e = Seq((1L, ts(1), "view")).toDF("user_id", "ts", "event_type")
    intercept[IllegalArgumentException](
      Funnel.steps(e, "user_id", col("ts"), "event_type", Seq("view", "view")))
  }
}
