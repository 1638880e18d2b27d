package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition-level HLL sketch index: one mergeable Datasketches HLL
  * per partition over a key column, maintained INCREMENTALLY from CDC
  * and unioned at query time — distinct-count questions over a 100 TB
  * table then cost O(partitions) sketch bytes instead of an O(table)
  * rescan.
  *
  * Maintenance granularity is the PARTITION, not the row: HLL absorbs
  * inserts but cannot retract, and an upsert REPLACES rows in the
  * partitions it touches, so the correct refresh is "rebuild sketches
  * of touched partitions from their current rows, carry every other
  * partition's sketch unchanged" — the exact mirror of how
  * [[graft.plans.SnapshotTable]] rewrites data files. Register-wise
  * HLL union is associative and deterministic, so the incrementally
  * maintained index answers IDENTICALLY to a from-scratch rebuild
  * (spec-pinned, not approximately — bit-equal estimates).
  */
object PartitionSketches {

  /** Per-partition sketches of `valueCol`: one row per partition value,
    * sketch = Datasketches HLL binary (mergeable). One shuffle on the
    * partition column with map-side partial aggregation. */
  def build(df: DataFrame, partCol: String, valueCol: String,
            lgConfigK: Int = 12): DataFrame =
    df.groupBy(partCol)
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("sketch"))

  /** Incremental refresh: sketches for the `touched` partition values
    * (one column, matching `partCol`) are rebuilt from `current` (the
    * table's present rows of those partitions), every other sketch
    * carries over by reference. `touched` is passed explicitly rather
    * than derived from `current`: a touched partition whose rows were
    * all removed is absent from `current`, and deriving touched from it
    * would silently CARRY the stale sketch instead of dropping it. */
  def refresh(index: DataFrame, current: DataFrame, touched: DataFrame,
              partCol: String, valueCol: String,
              lgConfigK: Int = 12): DataFrame = {
    val rebuilt = build(current, partCol, valueCol, lgConfigK)
    // null-SAFE anti-join: a NULL partition value is a legal partition
    // (Hive default partition), and a plain equi-anti-join would never
    // drop its stale sketch — the index would then hold BOTH the stale
    // and the rebuilt row and estimateTotal would double-count
    index.join(touched.select(col(touched.columns.head).as("__touched_pc")),
        col(partCol) <=> col("__touched_pc"), "left_anti")
      .unionByName(rebuilt)
  }

  /** Merged distinct estimate across the whole index — O(partitions)
    * sketch bytes through one union, never a data scan. */
  def estimateTotal(index: DataFrame): DataFrame =
    index.agg(
      count(lit(1)).as("n_partitions"),
      hll_sketch_estimate(hll_union_agg(col("sketch"))).as("distinct_est"))
}
