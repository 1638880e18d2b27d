package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming sessionization with custom per-key state —
  * `flatMapGroupsWithState` + event-time timeout, the Structured
  * Streaming shape for order-free session tracking: state holds the
  * open session per key; events extend it or close it (gap exceeded);
  * the event-time timeout flushes sessions whose gap window has passed
  * the watermark, bounding state size.
  *
  * Parity contract (tested): on a drained stream, emitted sessions ==
  * the batch [[graft.operators.Sessionize]] result for every CLOSED
  * session; the trailing open session per key stays in state — the
  * streaming-vs-batch difference is exactly that suffix.
  */
object StatefulSessions {

  final case class Event(key: Long, ts: Timestamp, value: Double)

  final case class SessionState(
      start: Long, last: Long, n: Long, total: Double)

  final case class Session(
      key: Long, n_events: Long, started: Timestamp, ended: Timestamp,
      total_value: Double)

  /** The per-key state transition: fold new events into the open
    * session, emitting every session that closes. Pure function —
    * shared by the streaming query and directly unit-testable.
    *
    * Out-of-order (watermark-admitted) events are handled in two steps:
    * the batch is first folded into LOCAL sessions under batch semantics
    * (so consecutive late stragglers merge with each other), then each
    * local session merges into the open cross-batch session only if it
    * is within `gapMillis` of EITHER edge — merging can lower `start`.
    * A local session ending more than a gap before the open session's
    * start is emitted as its own closed session (it can never extend the
    * open one; the watermark bounds how late such stragglers can be). */
  def transition(gapMillis: Long)(
      key: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(Session(key, s.n, new Timestamp(s.start),
        new Timestamp(s.last), s.total))
    }
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.value))
    val locals = Seq.newBuilder[SessionState]
    var cur: Option[SessionState] = None
    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(c) if t - c.last <= gapMillis =>
          cur = Some(c.copy(last = math.max(c.last, t), n = c.n + 1,
            total = c.total + e.value))
        case other =>
          other.foreach(locals += _)
          cur = Some(SessionState(t, t, 1, e.value))
      }
    }
    cur.foreach(locals += _)
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    def emit(s: SessionState): Unit =
      closed += Session(key, s.n, new Timestamp(s.start),
        new Timestamp(s.last), s.total)
    locals.result().foreach { l =>
      open match {
        case Some(s) if l.start - s.last <= gapMillis &&
                        s.start - l.last <= gapMillis =>
          open = Some(SessionState(
            math.min(s.start, l.start), math.max(s.last, l.last),
            s.n + l.n, s.total + l.total))
        case Some(s) if l.last < s.start - gapMillis =>
          emit(l) // entirely before the open session: already complete
        case Some(s) =>
          emit(s); open = Some(l) // gap after the open session: it closes
        case None =>
          open = Some(l)
      }
    }
    open match {
      case Some(s) =>
        state.update(s)
        // close the session once the watermark passes last + gap
        state.setTimeoutTimestamp(s.last + gapMillis)
      case None => state.remove()
    }
    closed.result().iterator
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
        transition(gapSeconds * 1000L))
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
