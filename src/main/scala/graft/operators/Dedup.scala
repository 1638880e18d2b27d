package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-based deduplication (A2; reference: orders_etl.py:59,
  * product_etl.py:57, order_items_etl.py:94 — `dropDuplicates([pk])`).
  *
  * Scale notes (100 TB): both variants are a single hash-partition shuffle
  * on the key with map-side partial aggregation — Catalyst plans
  * `dropDuplicates` as a partial+final HashAggregate, and the window
  * variant as one shuffle + in-partition sort. AQE coalesces/splits the
  * post-shuffle partitions at runtime, including skewed keys.
  */
object Dedup {

  /** Keep one ARBITRARY row per key — the reference's exact semantics.
    * Fine when source rows per key are identical or the caller doesn't
    * care which survives (the reference dedups pre-validated batches). */
  def arbitrary(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Deterministic variant (SURVEY.md §2.6): keep the first row per key
    * under an explicit tiebreak ordering — needed whenever downstream
    * comparison (oracle, idempotency check) must see stable output. */
  def deterministic(df: DataFrame, keys: Seq[String], tiebreak: Seq[Column]): DataFrame = {
    require(tiebreak.nonEmpty, "deterministic dedup needs a tiebreak ordering")
    val rn = "__graft_rn"
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tiebreak: _*)
    df.withColumn(rn, row_number().over(w)).filter(col(rn) === 1).drop(rn)
  }
}
