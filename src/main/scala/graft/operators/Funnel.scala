package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Ordered-sequence funnel analysis: how many users reach step 1, then
  * step 2 STRICTLY after their first step 1, then step 3 strictly
  * after that, … — the conversion query behind every product-analytics
  * dashboard.
  *
  * Shape (scale notes): ONE shuffle (groupBy user) collecting each
  * user's (ts, type) events sorted, then a single O(events × steps)
  * fold per user finds the earliest valid completion time of every
  * step — no self-joins (the naive SQL formulation joins the event
  * table once PER STEP). Per-user state is bounded by the user's own
  * event count, the same assumption sessionization makes.
  *
  * Step types must be distinct (an event advances at most one step).
  * Events sharing a timestamp do NOT satisfy "strictly after" — a
  * click at the exact instant of the first view is not a conversion.
  */
object Funnel {

  /** Per-step reach counts: one row per step, `users` = users whose
    * funnel got at least that deep. */
  def steps(events: DataFrame, userCol: String, ts: Column,
            typeCol: String, stepTypes: Seq[String]): DataFrame =
    foldSteps(events, userCol, ts, typeCol, stepTypes, None)

  /** [[steps]] with a CONVERSION WINDOW: later steps only count within
    * `windowSeconds` of the user's FIRST step-1 event (the anchor —
    * the semantics product-analytics tools call "conversion window",
    * anchored at the earliest funnel entry; a user who re-enters the
    * funnel later is not re-anchored). Same single-shuffle fold. */
  def stepsWithin(events: DataFrame, userCol: String, ts: Column,
                  typeCol: String, stepTypes: Seq[String],
                  windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, s"conversion window must be positive")
    foldSteps(events, userCol, ts, typeCol, stepTypes, Some(windowSeconds))
  }

  private def foldSteps(events: DataFrame, userCol: String, ts: Column,
                        typeCol: String, stepTypes: Seq[String],
                        windowSeconds: Option[Long]): DataFrame = {
    require(stepTypes.nonEmpty && stepTypes.distinct == stepTypes,
      s"funnel steps must be non-empty and distinct: $stepTypes")
    val n = stepTypes.size
    // Only step-type events can ever fill a slot, so everything else is
    // filtered BEFORE the shuffle: a real event log is mostly non-step
    // types, and collecting a heavy user's full history into one
    // collect_list array is the OOM shape at scale. The filter is
    // semantics-preserving — the fold skips non-step events anyway.
    val perUser = events
      .filter(col(typeCol).isin(stepTypes: _*))
      .groupBy(userCol)
      .agg(sort_array(collect_list(
        struct(ts.as("ts"), col(typeCol).as("et")))).as("seq"))
    val init = array(Seq.fill(n)(lit(null).cast(TimestampType)): _*)
    val stepLits = lit(stepTypes.toArray)
    // fold the sorted events once; slot i fills when empty, the type
    // matches step i, and slot i-1 filled strictly earlier. Sorted
    // order guarantees slot i-1 is already set by the time any
    // qualifying later event arrives.
    val folded = aggregate(col("seq"), init, (st, e) =>
      transform(sequence(lit(0), lit(n - 1)), i => {
        // ANSI element_at is 1-based and errors on 0: the i=0 probe is
        // never USED (the `when` guards it) but must not throw either
        val prev = element_at(st, when(i > 0, i).otherwise(lit(1)))
        // conversion window: anchored at slot 1 (the first step-1
        // event) — by fill order st[1] is set before any i>0 slot
        val inWindow = windowSeconds.fold(lit(true))(w =>
          e.getField("ts") <= element_at(st, 1) +
            make_dt_interval(lit(0), lit(0), lit(0), lit(w.toDouble)))
        val ok = element_at(st, i + 1).isNull &&
          e.getField("et") === element_at(stepLits, i + 1) &&
          (i === 0 || (prev.isNotNull && e.getField("ts") > prev && inWindow))
        when(ok, e.getField("ts")).otherwise(element_at(st, i + 1))
      }))
    val aggs = (0 until n).map(i =>
      sum(when(element_at(col("t"), i + 1).isNotNull, 1L).otherwise(0L))
        .as(s"__u$i"))
    val reach = perUser.select(folded.as("t")).agg(aggs.head, aggs.tail: _*)
    reach.select(explode(array((0 until n).map(i =>
      struct(lit(stepTypes(i)).as("step"),
        coalesce(col(s"__u$i"), lit(0L)).as("users"))): _*)).as("r"))
      .select(col("r.step"), col("r.users"))
  }
}
