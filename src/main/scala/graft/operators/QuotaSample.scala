package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group quota capping — the domain-balancing curation stage
  * (RefinedWeb/FineWeb-style pipelines cap each domain's contribution
  * so one crawl-heavy site cannot dominate the corpus). Keeps each
  * group's `cap` rows with the smallest md5(id): deterministic, order-
  * independent, and re-runnable.
  *
  * Scale design (100 TB): the naive form is one window partitioned by
  * group — and a billion-document domain then serializes through a
  * single task. This implementation is the exact two-level top-k:
  * stage 1 ranks within (group, salt) — every partition bounded by
  * rows/salts — and keeps `cap` per salt; stage 2 ranks the surviving
  * ≤ salts·cap rows per group. The union of per-salt top-caps always
  * contains the global top-cap, so the result is IDENTICAL to the
  * single window (the oracle replays the single-window form), at the
  * cost of one extra shuffle over an already-capped set. */
object QuotaSample {

  def cap(df: DataFrame, keyCol: String, idCol: String, quota: Int,
          salts: Int = 16): DataFrame = {
    require(quota >= 1, s"quota must be >= 1, got $quota")
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val h = md5(col(idCol).cast("string"))
    val w1 = Window
      .partitionBy(col(keyCol), pmod(hash(col(idCol)), lit(salts)))
      .orderBy(h, col(idCol))
    val survivors = df.withColumn("__rk", row_number().over(w1))
      .filter(col("__rk") <= quota).drop("__rk")
    val w2 = Window.partitionBy(col(keyCol)).orderBy(h, col(idCol))
    survivors.withColumn("__rk", row_number().over(w2))
      .filter(col("__rk") <= quota).drop("__rk")
  }
}
