package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col}

/** Referential-integrity check (J1/J2; reference:
  * order_items_etl.py:72-90).
  *
  * The reference does a left OUTER join and then filters on a null probe
  * column, re-projecting the left schema afterwards. That is exactly a
  * semi/anti split, which is how we express it — Catalyst then prunes the
  * dim to just the key column and never materializes the join payload
  * (SURVEY.md §2.4; also fixes the reference's latent null-probe bug).
  *
  * Scale notes (100 TB): dims like products/orders-keys are small relative
  * to the fact — `broadcastDim = true` forces a BroadcastHashJoin so the
  * fact table never shuffles. With it false, Catalyst still auto-broadcasts
  * under the threshold, else plans a shuffled hash/sort-merge join on the
  * key; either way the dim is reduced to distinct keys first.
  */
object Integrity {

  /** Split fact rows into (kept = key exists in dim, orphans = it
    * doesn't). `factKey`/`dimKey` may differ (star-schema FK naming). */
  def split(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
            broadcastDim: Boolean = false): (DataFrame, DataFrame) =
    splitOnKeys(fact, dim.select(col(dimKey).as(factKey)).distinct(),
      factKey, broadcastDim)

  /** Split against a pre-extracted distinct key frame (single column
    * named `factKey`). Callers issuing several actions over the same
    * split should `persist()` the key frame first — otherwise every
    * action re-scans the dim table (at 100 TB: re-lists and re-reads a
    * partitioned table per count). */
  def splitOnKeys(fact: DataFrame, keys0: DataFrame, factKey: String,
                  broadcastDim: Boolean = false): (DataFrame, DataFrame) = {
    val keys = if (broadcastDim) broadcast(keys0) else keys0
    (fact.join(keys, Seq(factKey), "left_semi"),
     fact.join(keys, Seq(factKey), "left_anti"))
  }

  /** Same-named key convenience (the reference's case: order_id,
    * product_id). */
  def split(fact: DataFrame, dim: DataFrame, key: String): (DataFrame, DataFrame) =
    split(fact, dim, key, key)

  /** Kept side only (EXISTS). */
  def existing(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
               broadcastDim: Boolean = false): DataFrame =
    split(fact, dim, factKey, dimKey, broadcastDim)._1

  /** Orphan side only (NOT EXISTS) — the RI violations the reference
    * appends to rejected/ (order_items_etl.py:76,87). */
  def orphans(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
              broadcastDim: Boolean = false): DataFrame =
    split(fact, dim, factKey, dimKey, broadcastDim)._2
}
