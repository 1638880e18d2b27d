package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Sessionize

class StatefulSessionsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private def us(s: String): Long = ts(s).getTime * 1000L
  private val Gap = 1800L * 1000000L // 30 min in micros

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
    // key1 10:00-10:10 (final watermark 11:59 > its 10:40 close point)
    // and key2's 09:00 singleton (close point 09:30)
    assert(streamed.contains((1L, 2L, "2024-01-01 10:00:00.0",
      "2024-01-01 10:10:00.0", 3.0)), streamed.toString)
    assert(streamed.contains((2L, 1L, "2024-01-01 09:00:00.0",
      "2024-01-01 09:00:00.0", 8.0)), streamed.toString)
    // key1's trailing session (12:00; close point 12:30 > watermark
    // 11:59) must remain open and unemitted
    assert(!streamed.exists(s => s._3 == "2024-01-01 12:00:00.0"))
  }

  test("transition function: in-batch gap closes the earlier session once the watermark passes") {
    val state = new TestGroupState[StatefulSessions.PendingSessions]
    state.watermarkMs = ts("2024-01-01 10:00:00").getTime // 09:30 < wm
    val out = StatefulSessions.transition(Gap)(
      7L, fixture.filter(_.key == 2L).iterator, state).toSeq
    assert(out.map(s => (s.n_events, s.total_value)) == Seq((1L, 8.0)))
    // the 11:00 session stays pending (close point 11:30 > wm)
    assert(state.updated.exists(_.sessions.map(_.n) == Seq(1L)))
  }

  test("transition: late event within gap of start merges and LOWERS start") {
    val state = new TestGroupState[StatefulSessions.PendingSessions]
    state.update(StatefulSessions.PendingSessions(Seq(
      StatefulSessions.SessionState(
        us("2024-01-01 10:00:00"), us("2024-01-01 10:10:00"), 2, 3.0))))
    val late = Iterator(
      StatefulSessions.Event(7L, ts("2024-01-01 09:45:00"), 1.0))
    val out = StatefulSessions.transition(Gap)(7L, late, state).toSeq
    assert(out.isEmpty)
    val Seq(s) = state.updated.get.sessions
    assert(s.start == us("2024-01-01 09:45:00"), "start not lowered")
    assert(s.n == 3 && s.total == 4.0)
  }

  test("transition: stragglers before the open session stay pending until their gap passes") {
    val state = new TestGroupState[StatefulSessions.PendingSessions]
    state.update(StatefulSessions.PendingSessions(Seq(
      StatefulSessions.SessionState(
        us("2024-01-01 10:00:00"), us("2024-01-01 10:10:00"), 2, 3.0))))
    // two stragglers hours earlier, within a gap of EACH OTHER: one
    // session, emitted only because the watermark passed its close
    // point — and the open session must be untouched
    state.watermarkMs = ts("2024-01-01 09:00:00").getTime
    val stragglers = Iterator(
      StatefulSessions.Event(7L, ts("2024-01-01 06:00:00"), 1.0),
      StatefulSessions.Event(7L, ts("2024-01-01 06:20:00"), 2.0))
    val out = StatefulSessions.transition(Gap)(7L, stragglers, state).toSeq
    assert(out.map(s => (s.n_events, s.started.toString, s.total_value)) ==
      Seq((2L, "2024-01-01 06:00:00.0", 3.0)), out.toString)
    val Seq(s) = state.updated.get.sessions
    assert(s.start == us("2024-01-01 10:00:00") && s.n == 2,
      "open session was corrupted by the stragglers")
  }

  test("transition: stragglers arriving across BATCHES merge into one session (no premature split)") {
    // the round-7 regression: emitting a pre-open-session straggler
    // immediately split what batch semantics would keep as ONE session
    val state = new TestGroupState[StatefulSessions.PendingSessions]
    state.update(StatefulSessions.PendingSessions(Seq(
      StatefulSessions.SessionState(
        us("2024-01-01 10:00:00"), us("2024-01-01 10:00:00"), 1, 1.0))))
    // batch A: straggler at 05:00 — watermark still low, nothing emits
    val outA = StatefulSessions.transition(Gap)(7L,
      Iterator(StatefulSessions.Event(7L, ts("2024-01-01 05:00:00"), 1.0)),
      state).toSeq
    assert(outA.isEmpty, s"premature emission: $outA")
    // batch B: straggler at 05:10 — must EXTEND the pending 05:00
    // session, not open a second one
    val outB = StatefulSessions.transition(Gap)(7L,
      Iterator(StatefulSessions.Event(7L, ts("2024-01-01 05:10:00"), 2.0)),
      state).toSeq
    assert(outB.isEmpty)
    // watermark passes 05:40: exactly one merged session emits
    state.watermarkMs = ts("2024-01-01 06:00:00").getTime
    val outC = StatefulSessions.transition(Gap)(7L, Iterator.empty, state).toSeq
    assert(outC.map(s => (s.n_events, s.started.toString, s.ended.toString,
      s.total_value)) ==
      Seq((2L, "2024-01-01 05:00:00.0", "2024-01-01 05:10:00.0", 3.0)),
      outC.toString)
    // the 10:00 session is still pending
    assert(state.updated.get.sessions.map(_.start) ==
      Seq(us("2024-01-01 10:00:00")))
  }

  test("transition preserves sub-millisecond event times") {
    val state = new TestGroupState[StatefulSessions.PendingSessions]
    val t = ts("2024-01-01 08:00:00")
    t.setNanos(500000) // 08:00:00.000500
    state.watermarkMs = ts("2024-01-01 09:00:00").getTime
    val out = StatefulSessions.transition(Gap)(7L,
      Iterator(StatefulSessions.Event(7L, t, 1.0)), state).toSeq
    assert(out.map(_.started.getNanos) == Seq(500000),
      s"microseconds truncated: $out")
  }

  /** Minimal GroupState stub for driving the transition function. */
  private class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
    var updated: Option[S] = None
    var timeoutTs: Option[Long] = None
    var watermarkMs: Long = 0L
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
    override def getCurrentWatermarkMs(): Long = watermarkMs
    override def getCurrentProcessingTimeMs(): Long = 0L
  }
}
