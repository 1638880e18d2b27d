package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Slowly-changing-dimension TYPE 2 maintenance: apply a batch of
  * dimension rows to a full-history table, closing the prior version of
  * every key whose tracked attributes changed and inserting the new
  * version — the warehouse MERGE pattern one PK-replace upsert
  * (reference: orders_etl.py MERGE, our K2) cannot express, because a
  * key's history must be kept, not overwritten.
  *
  * History schema = key ++ tracked ++ (`effective_from` timestamp,
  * `effective_to` timestamp nullable, `is_current` boolean).
  *
  * Shape (scale notes): ONE full-outer shuffle join of the CURRENT
  * slice against the batch on the key, then a single projection whose
  * per-row CASE emits keep / close / close+insert / insert via
  * `explode` — no second pass, no driver loop; already-closed history
  * rows stream through untouched via union. Attribute comparison is
  * null-safe (`<=>`), so null→value and value→null both count as
  * changes and re-applying the same batch is a no-op (idempotent).
  */
object Scd2 {

  val FromCol = "effective_from"
  val ToCol = "effective_to"
  val CurrentCol = "is_current"

  private def metaCols = Seq(FromCol, ToCol, CurrentCol)

  /** An initial SCD2 history from a first dimension load: every row
    * current as of `batchTs`. */
  def init(dim: DataFrame, key: String, tracked: Seq[String],
           batchTs: Column): DataFrame =
    dim.select(
      (key +: tracked).map(col) ++ Seq(
        batchTs.cast(TimestampType).as(FromCol),
        lit(null).cast(TimestampType).as(ToCol),
        lit(true).as(CurrentCol)): _*)

  /** Apply one batch of dimension rows to an existing history.
    *
    * Per key: absent from the batch → history untouched; present with
    * identical tracked attributes → untouched; present with changed
    * attributes → current version closed at `batchTs` and a new current
    * version inserted; brand-new key → inserted current. Rows already
    * closed in the history pass through by union (never re-joined).
    *
    * PRECONDITION: `updates` carries at most one row per key (a batch
    * is a dimension snapshot, not an event log). Duplicate keys would
    * fan out the join and close the same version twice — collapse an
    * event-log batch to latest-per-key first (e.g.
    * [[Dedup.deterministic]] on an event-time ordering). */
  def applyBatch(history: DataFrame, updates: DataFrame, key: String,
                 tracked: Seq[String], batchTs: Column): DataFrame = {
    val outCols = (key +: tracked) ++ metaCols
    val closed = history.filter(!col(CurrentCol))
      .select(outCols.map(col): _*)
    val cur = history.filter(col(CurrentCol))
    val u = updates.select(col(key).as(key) +:
      tracked.map(c => col(c).as(s"__u_$c")) :+ lit(true).as("__in_batch"): _*)

    val j = cur.join(u, Seq(key), "full_outer")
    // null-safe presence flags: after a full-outer join the absent side
    // is null, and a plain === would make the whole CASE fall through
    val inBatch = col("__in_batch") <=> lit(true)
    val inCur = col(CurrentCol) <=> lit(true)
    val changed = tracked
      .map(c => !(col(c) <=> col(s"__u_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))

    val ts = batchTs.cast(TimestampType)
    def row(cols: Seq[Column]) = struct(
      outCols.zip(cols).map { case (n, c) => c.as(n) }: _*)
    val keepRow = row((key +: tracked).map(col) ++
      Seq(col(FromCol), col(ToCol), col(CurrentCol)))
    val closeRow = row((key +: tracked).map(col) ++
      Seq(col(FromCol), ts, lit(false)))
    val insertRow = row((col(key) +: tracked.map(c => col(s"__u_$c"))) ++
      Seq(ts, lit(null).cast(TimestampType), lit(true)))

    val emitted =
      when(!inCur, array(insertRow)) // new key
        .when(!inBatch || !changed, array(keepRow)) // absent or unchanged
        .otherwise(array(closeRow, insertRow)) // changed: close + insert
    closed.unionByName(
      j.select(explode(emitted).as("__r")).select(col("__r.*")))
  }
}
