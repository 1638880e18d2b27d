package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention analysis: users cohorted by their first activity
  * day; retention at offset k = share of the cohort active exactly k
  * days after that first day — the matrix behind every retention
  * dashboard.
  *
  * Shape (scale notes): the event stream is scanned exactly twice —
  * once for per-event days, once for the per-user first-activity
  * aggregate — and PlanSpec pins that count. The events⋈first join
  * keys on the user column: at small scale Catalyst broadcasts the
  * (one row per user) aggregate; at a scale where O(users) no longer
  * broadcasts, AQE falls back to a shuffle join whose aggregate side
  * is already partitioned by user, so the join costs one shuffle of
  * the events, never two. The per-(cohort, offset) distinct-user
  * count then reduces over the small (cohorts × offsets) key space.
  * Nothing is collected; per-user state never exceeds the user's own
  * activity days.
  */
object Retention {

  /** One row per (cohort_day, day_offset) with the cohort's size, the
    * users active at that offset, and the retention rate. Offsets are
    * capped at `maxOffsetDays` to bound the output (a year-long log
    * would otherwise emit one row per lived day per cohort).
    *
    * Cohort sizes are NOT a separate aggregate over the event stream:
    * every user is active at offset 0 by construction, so the size is
    * the cohort's offset-0 cell of the same counts matrix, read back
    * with a window max over the (tiny) matrix — ONE lineage, no second
    * scan of the events. (A `counts.filter(offset === 0)` self-join
    * looks equivalent but Catalyst pushes the filter into the join and
    * the re-derived branch re-scans the whole event stream.) */
  def cohorts(events: DataFrame, userCol: String, ts: Column,
              maxOffsetDays: Int = 30): DataFrame = {
    val days = events.select(col(userCol).as("user"), to_date(ts).as("day"))
    val first = days.groupBy("user").agg(min("day").as("cohort_day"))
    val activity = days.join(first, Seq("user"))
      .select(col("user"), col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .filter(col("day_offset") <= maxOffsetDays)
      .distinct() // a user counts once per (cohort, offset)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cohort_day")
    activity.groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("active_users"))
      .withColumn("cohort_size",
        max(when(col("day_offset") === 0, col("active_users"))).over(w))
      .select(
        date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"), col("active_users"), col("cohort_size"),
        round(col("active_users") / col("cohort_size"), 4).as("retention"))
  }
}
