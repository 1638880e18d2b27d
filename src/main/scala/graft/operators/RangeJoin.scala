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
                      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val i = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(i, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
