package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range join: match points to intervals (`lo ≤ p ≤ hi`). Spark plans a
  * bare inequality join as BroadcastNestedLoopJoin — O(points ×
  * intervals) and a guaranteed scale-killer. This operator bins the
  * value domain: each point lands in one bin, each interval explodes to
  * every bin it overlaps, the join becomes an equi-join on bin, and the
  * exact predicate re-checks candidates. Cost: one hash shuffle on bin;
  * interval replication = interval width / binWidth (pick binWidth near
  * the typical interval width so replication stays O(1)).
  */
object RangeJoin {

  /** Inner join of `points` (value in `pointCol`) with `intervals`
    * (`loCol`..`hiCol` inclusive). Output: all point columns + all
    * interval columns, exactly the rows of the naive theta join. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      binWidth: Double,
                      /** Per-interval replication cap. ONE sentinel-wide
                        * interval ("no expiry" = 9e15) against a binWidth
                        * sized for typical rows would otherwise ask
                        * `sequence()` for billions of elements and kill
                        * the whole job at Spark's array-length limit —
                        * fail fast, per row, with a message naming the
                        * knob instead. */
                      maxBinsPerInterval: Long = 1L << 20): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val loBin = floor(col(loCol) / binWidth).cast("long")
    val hiBin = floor(col(hiCol) / binWidth).cast("long")
    // the guard is FOLDED into the sequence bound (assert_true yields
    // null when it passes; coalesce makes it a no-op term) — a separate
    // dropped guard column would be pruned away before ever evaluating.
    // NULL-bounded intervals are legal and drop the row (sequence(null,x)
    // is null, explode drops it) — exactly what the naive theta join does
    // with a NULL comparison — so the assert must pass them through, not
    // trip on the null `hiBin - loBin`.
    val guard = assert_true(
      col(loCol).isNull || col(hiCol).isNull ||
        hiBin - loBin < maxBinsPerInterval,
      concat(lit("range-join interval spans too many bins (cap " +
          s"$maxBinsPerInterval): ["), col(loCol), lit(", "), col(hiCol),
        lit(s"] at binWidth $binWidth — widen binWidth or raise " +
          "maxBinsPerInterval")))
    val i = intervals.withColumn("__bin",
      explode(sequence(loBin + coalesce(guard.cast("long"), lit(0L)), hiBin)))
    p.join(i, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
