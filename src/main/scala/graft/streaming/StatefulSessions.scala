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
    * shared by the streaming query and directly unit-testable. */
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
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val t = e.ts.getTime
      open match {
        case Some(s) if t - s.last <= gapMillis =>
          open = Some(s.copy(last = math.max(s.last, t), n = s.n + 1,
            total = s.total + e.value))
        case Some(s) =>
          closed += Session(key, s.n, new Timestamp(s.start),
            new Timestamp(s.last), s.total)
          open = Some(SessionState(t, t, 1, e.value))
        case None =>
          open = Some(SessionState(t, t, 1, e.value))
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
