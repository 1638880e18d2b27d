package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming sessionization with custom per-key state —
  * `flatMapGroupsWithState` + event-time timeout, the Structured
  * Streaming shape for order-free session tracking: state holds the
  * PENDING sessions per key (not just the newest — a watermark-admitted
  * straggler may open a session far before the current one, and a later
  * straggler may extend it); a session is emitted only once the
  * watermark passes its `end + gap`, at which point no admissible event
  * can extend it. State stays bounded: the same watermark that gates
  * emission also caps how many sessions can be pending (gap windows
  * inside the watermark delay).
  *
  * All session arithmetic runs on MICROSECONDS — `Timestamp.getTime`
  * millisecond truncation would silently break streaming-vs-batch
  * parity on sub-millisecond event times (the `StreamingFunnel.micros`
  * rule).
  *
  * Parity contract (tested): on a drained stream, emitted sessions ==
  * the batch [[graft.operators.Sessionize]] result for every session
  * whose gap window the final watermark passed; later sessions stay in
  * state — the streaming-vs-batch difference is exactly that suffix.
  */
object StatefulSessions {

  final case class Event(key: Long, ts: Timestamp, value: Double)

  /** One session, timestamps in MICROSECONDS since epoch. */
  final case class SessionState(
      start: Long, last: Long, n: Long, total: Double)

  /** Every not-yet-emittable session for the key, ascending by start. */
  final case class PendingSessions(sessions: Seq[SessionState])

  final case class Session(
      key: Long, n_events: Long, started: Timestamp, ended: Timestamp,
      total_value: Double)

  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** The per-key state transition: fold new events into the pending
    * session set, emitting every session whose gap window the current
    * watermark has passed. Pure function — shared by the streaming
    * query and directly unit-testable.
    *
    * The batch's events and the pending sessions are merged under the
    * SAME fold batch sessionization uses (sort by start, merge
    * neighbors within the gap), so any admissible straggler — before,
    * between, or bridging pending sessions — lands exactly where a
    * batch recomputation would put it. */
  def transition(gapMicros: Long)(
      key: Long, events: Iterator[Event],
      state: GroupState[PendingSessions]): Iterator[Session] = {
    val fresh = events.toSeq
      .sortBy(e => (micros(e.ts), e.value))
      .map(e => SessionState(micros(e.ts), micros(e.ts), 1, e.value))
    val all = (state.getOption.map(_.sessions).getOrElse(Nil) ++ fresh)
      .sortBy(s => (s.start, s.last))
    // gaps-and-islands fold over sessions: disjoint event sets make the
    // stats additive, so merging session summaries equals re-running
    // the fold over the raw events
    val merged = all.foldLeft(List.empty[SessionState]) {
      case (cur :: done, s) if s.start - cur.last <= gapMicros =>
        cur.copy(last = math.max(cur.last, s.last), n = cur.n + s.n,
          total = cur.total + s.total) :: done
      case (acc, s) => s :: acc
    }.reverse
    // a session is CLOSED only when no admissible event can extend it.
    // Spark's late-data filter ADMITS events with ts == watermark, and an
    // event at exactly last + gap still merges (t - last <= gap), so the
    // close test must be STRICT: watermark strictly past end + gap.
    val wmMicros = state.getCurrentWatermarkMs() * 1000L
    val (done, pending) = merged.partition(_.last + gapMicros < wmMicros)
    if (pending.nonEmpty) {
      state.update(PendingSessions(pending))
      // re-arm at the smallest ms T with T*1000 strictly past the
      // earliest close point — guarantees the timeout's watermark
      // satisfies the strict close test and strictly advances even when
      // nextUs == wmMicros (possible under the strict partition above)
      val nextUs = pending.map(_.last + gapMicros).min
      state.setTimeoutTimestamp(Math.floorDiv(nextUs, 1000L) + 1L)
    } else state.remove()
    done.iterator.map(s =>
      Session(key, s.n, toTs(s.start), toTs(s.last), s.total))
  }

  /** Run the stateful sessionization over a parquet file stream of
    * [[Event]] rows; closed sessions append to `outDir`. */
  def run(spark: SparkSession, landingDir: String, gapSeconds: Long,
          delay: String, outDir: String, checkpointDir: String): Unit = {
    import spark.implicits._
    val schema = org.apache.spark.sql.Encoders.product[Event].schema
    val events: Dataset[Event] = spark.readStream.schema(schema)
      .parquet(landingDir)
      .withWatermark("ts", delay)
      .as[Event]
    val q = events
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        transition(gapSeconds * 1000000L))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
