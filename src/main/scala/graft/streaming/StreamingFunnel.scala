package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming conversion funnel with custom per-user state: slots hold
  * the earliest valid fill time per step, micro-batches fold new step
  * events into them, and each batch emits the user's current depth
  * (monotone — the final depth per user is the max emission).
  *
  * Ordering contract: the greedy slot fill is exact when micro-batches
  * arrive in event-time order (the range-clustered landing shape a log
  * shipper produces) — out-of-order WITHIN a batch is sorted locally.
  * An event-time-late batch can only make reach counts conservative
  * (a slot records a later fill time than the true earliest); exact
  * arbitrary-order streaming would require retaining per-user event
  * history, which is what the batch operator is for. State is
  * O(steps) per user — production deployments should add an
  * event-time timeout to evict users whose window has passed.
  *
  * Parity contract (oracle-checked): on a drained time-ordered stream,
  * per-step reach == the batch [[graft.operators.Funnel.steps]]
  * result.
  */
object StreamingFunnel {

  final case class StepEvent(user: Long, ts: Timestamp, et: String)

  final case class Reach(user: Long, depth: Int)

  /** Unfilled-slot sentinel: MinValue, not -1 — a legitimate event one
    * millisecond before the epoch must not read as an empty slot. */
  private val Empty = Long.MinValue

  /** Epoch MICROseconds of a Timestamp: getTime() truncates to millis,
    * but TimestampType carries microsecond precision and the batch
    * operator's strictly-after comparison sees it — comparing millis
    * here would silently break parity for same-millisecond events. */
  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  /** Per-user state transition: fold the batch's events (sorted by
    * (ts, type) — the batch fold's exact tie order, at full microsecond
    * precision) into the slot array; slot i fills at the first event of
    * step i strictly after slot i-1's fill. Pure function, directly
    * unit-testable. */
  def transition(stepTypes: Seq[String])(
      user: Long, events: Iterator[StepEvent],
      state: GroupState[Array[Long]]): Iterator[Reach] = {
    // same contract as the batch operator: a duplicate step type would
    // silently map to its LAST slot only and depth would stick at 0
    require(stepTypes.nonEmpty && stepTypes.distinct == stepTypes,
      s"funnel steps must be non-empty and distinct: $stepTypes")
    val n = stepTypes.size
    val idx = stepTypes.zipWithIndex.toMap
    val slots = state.getOption.getOrElse(Array.fill(n)(Empty))
    events.toSeq.sortBy(e => (micros(e.ts), e.et)).foreach { e =>
      idx.get(e.et).foreach { i =>
        val t = micros(e.ts)
        val ok = slots(i) == Empty &&
          (i == 0 || (slots(i - 1) != Empty && t > slots(i - 1)))
        if (ok) slots(i) = t
      }
    }
    state.update(slots)
    Iterator(Reach(user, slots.count(_ != Empty)))
  }

  /** Drain a parquet stream of [[StepEvent]] rows (AvailableNow),
    * appending per-batch (user, depth) rows to `outDir`. */
  def run(spark: SparkSession, landingDir: String, stepTypes: Seq[String],
          outDir: String, checkpointDir: String,
          maxFilesPerTrigger: Int): Unit = {
    require(stepTypes.nonEmpty && stepTypes.distinct == stepTypes,
      s"funnel steps must be non-empty and distinct: $stepTypes")
    import spark.implicits._
    val schema = org.apache.spark.sql.Encoders.product[StepEvent].schema
    val events: Dataset[StepEvent] = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(landingDir)
      // only step types can fill slots: filtered BEFORE the stateful
      // shuffle, same as the batch operator
      .filter(col("et").isin(stepTypes: _*))
      .as[StepEvent]
    val q = events
      .groupByKey(_.user)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        transition(stepTypes))
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
