package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (gaps-and-islands): consecutive events of
  * the same key belong to one session while the inter-event gap stays
  * under `gapSeconds`; a larger gap opens a new session.
  *
  * Batch form: two window passes over (key, time) — lag to flag session
  * starts, running sum to number them — then one grouped aggregate.
  * All three share a single hash-partition shuffle on the key (the sort
  * within partitions is pipelined), so the cost at 100 TB is one
  * shuffle + sort of the fact, which is the lower bound for any
  * order-sensitive per-key computation. The streaming form
  * ([[graft.streaming.StatefulSessions]]) replaces the sort with
  * per-key state + event-time timeouts.
  */
object Sessionize {

  /** Sessions per key: (key, session_seq, n_events, started, ended,
    * total_value). `tsCol` must be a TimestampType column; ordering ties
    * break on `tieCol` (results are gap-invariant under equal
    * timestamps either way). */
  def sessions(df: DataFrame, keyCol: String, tsCol: Column, tieCol: String,
               valueCol: String, gapSeconds: Long): DataFrame = {
    val byTime = Window.partitionBy(keyCol)
      .orderBy(col("__ts"), col(tieCol))
    // millisecond arithmetic, NOT unix_timestamp (whole-second
    // truncation): the streaming form (StatefulSessions) compares raw
    // milliseconds, and sub-second timestamps must sessionize
    // identically in both
    val newSession = when(
      unix_millis(col("__ts")) -
        unix_millis(lag(col("__ts"), 1).over(byTime)) > gapSeconds * 1000L, 1)
      .otherwise(0)
    val numbered = df
      .withColumn("__ts", tsCol)
      .withColumn("__new", newSession)
      .withColumn("session_seq",
        sum(col("__new")).over(byTime.rowsBetween(Window.unboundedPreceding, 0)))
    numbered
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("__ts")).as("started"),
        max(col("__ts")).as("ended"),
        round(sum(col(valueCol)), 2).as("total_value"))
  }
}
