package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Sessionize

class StatefulSessionsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val fixture = Seq(
    // key 1: one session (2 events), then a trailing session after a gap
    StatefulSessions.Event(1L, ts("2024-01-01 10:00:00"), 1.0),
    StatefulSessions.Event(1L, ts("2024-01-01 10:10:00"), 2.0),
    StatefulSessions.Event(1L, ts("2024-01-01 12:00:00"), 4.0),
    // key 2: session closed by a later arrival, then trailing
    StatefulSessions.Event(2L, ts("2024-01-01 09:00:00"), 8.0),
    StatefulSessions.Event(2L, ts("2024-01-01 11:00:00"), 16.0))

  test("streaming sessions match batch sessionization for closed sessions") {
    val landing = Files.createTempDirectory("graft_sess_land").toString
    val out = Files.createTempDirectory("graft_sess_out").toString
    val cp = Files.createTempDirectory("graft_sess_cp").toString
    fixture.toDS().coalesce(1).write.mode("overwrite").parquet(landing)
    StatefulSessions.run(spark, landing, gapSeconds = 1800,
      delay = "1 minute", outDir = out, checkpointDir = cp)

    val streamed = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("n_events"),
        r.getAs[Timestamp]("started").toString,
        r.getAs[Timestamp]("ended").toString,
        r.getAs[Double]("total_value"))).toSet

    // batch ground truth over the same fixture
    val batch = Sessionize.sessions(
      fixture.toDF("user_id", "ts", "value"), "user_id", col("ts"),
      "value", "value", gapSeconds = 1800)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Timestamp]("started").toString,
        r.getAs[Timestamp]("ended").toString,
        r.getAs[Double]("total_value"))).toSet

    // every streamed (closed) session appears identically in batch
    assert(streamed.subsetOf(batch), s"streamed=$streamed\nbatch=$batch")
    // the two early sessions are definitely closed and emitted:
    // key1 10:00-10:10 (watermark 11:59 > 10:40 timeout) and key2's
    // 09:00 singleton (closed by the 11:00 arrival)
    assert(streamed.contains((1L, 2L, "2024-01-01 10:00:00.0",
      "2024-01-01 10:10:00.0", 3.0)), streamed.toString)
    assert(streamed.contains((2L, 1L, "2024-01-01 09:00:00.0",
      "2024-01-01 09:00:00.0", 8.0)), streamed.toString)
    // trailing sessions (key1@12:00, key2@11:00) remain open: not emitted
    assert(!streamed.exists(s => s._3 == "2024-01-01 12:00:00.0"))
  }

  test("transition function: in-batch gap closes the earlier session") {
    // pure-function test, no streaming harness
    val state = new TestGroupState[StatefulSessions.SessionState]
    val out = StatefulSessions.transition(1800 * 1000L)(
      7L, fixture.filter(_.key == 2L).iterator, state).toSeq
    assert(out.map(s => (s.n_events, s.total_value)) == Seq((1L, 8.0)))
    assert(state.updated.exists(_.n == 1)) // trailing session in state
  }

  test("transition: late event within gap of start merges and LOWERS start") {
    val state = new TestGroupState[StatefulSessions.SessionState]
    state.update(StatefulSessions.SessionState(
      ts("2024-01-01 10:00:00").getTime, ts("2024-01-01 10:10:00").getTime, 2, 3.0))
    val late = Iterator(
      StatefulSessions.Event(7L, ts("2024-01-01 09:45:00"), 1.0))
    val out = StatefulSessions.transition(1800 * 1000L)(7L, late, state).toSeq
    assert(out.isEmpty)
    val s = state.updated.get
    assert(s.start == ts("2024-01-01 09:45:00").getTime, "start not lowered")
    assert(s.n == 3 && s.total == 4.0)
  }

  test("transition: event far before the open session is its own closed session") {
    val state = new TestGroupState[StatefulSessions.SessionState]
    state.update(StatefulSessions.SessionState(
      ts("2024-01-01 10:00:00").getTime, ts("2024-01-01 10:10:00").getTime, 2, 3.0))
    // two stragglers hours earlier, within a gap of EACH OTHER: they must
    // form ONE closed session and must NOT absorb into the open session
    val stragglers = Iterator(
      StatefulSessions.Event(7L, ts("2024-01-01 06:00:00"), 1.0),
      StatefulSessions.Event(7L, ts("2024-01-01 06:20:00"), 2.0))
    val out = StatefulSessions.transition(1800 * 1000L)(7L, stragglers, state).toSeq
    assert(out.map(s => (s.n_events, s.started.toString, s.total_value)) ==
      Seq((2L, "2024-01-01 06:00:00.0", 3.0)), out.toString)
    val s = state.updated.get
    assert(s.start == ts("2024-01-01 10:00:00").getTime && s.n == 2,
      "open session was corrupted by the stragglers")
  }

  /** Minimal GroupState stub for driving the transition function. */
  private class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
    var updated: Option[S] = None
    var timeoutTs: Option[Long] = None
    override def exists: Boolean = updated.isDefined
    override def get: S = updated.get
    override def getOption: Option[S] = updated
    override def update(s: S): Unit = updated = Some(s)
    override def remove(): Unit = updated = None
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(d: Long): Unit = ()
    override def setTimeoutDuration(d: String): Unit = ()
    override def setTimeoutTimestamp(t: Long): Unit = timeoutTs = Some(t)
    override def setTimeoutTimestamp(t: Long, additional: String): Unit = ()
    override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(t: java.sql.Date, additional: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }
}
