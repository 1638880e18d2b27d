package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row of
  * the same key whose time is ≤ the left row's time — the standard
  * temporal enrichment (trade→quote, event→latest-dimension-state) that
  * Spark has no built-in operator for.
  *
  * Implementation is the scalable union-sort form, NOT a per-row probe:
  * tag both sides, union, sort within key by (time, side, tiebreak),
  * and carry the last non-null right payload forward with a running
  * `last(ignoreNulls)` window. Cost at 100 TB: ONE hash-partition
  * shuffle on the key + an in-partition sort — identical shape to any
  * other order-sensitive per-key operator, no matter how many right
  * rows precede each left row (a LATERAL/subquery formulation would be
  * O(left × right-per-key)). Right rows at exactly the left row's time
  * match (≤, inclusive); ties among equal right times break on
  * `rightTiebreak` (largest wins), keeping results deterministic.
  */
object AsOfJoin {

  def lastPriorMatch(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     leftTime: Column, rightTime: Column,
                     rightTiebreak: String,
                     rightPayloadCols: Seq[String]): DataFrame = {
    val payload = struct(rightPayloadCols.map(col): _*)
    val payloadType = org.apache.spark.sql.types.StructType(
      right.select(rightPayloadCols.map(col): _*).schema.fields)
    val leftCols = left.columns.toIndexedSeq
    val l = left
      .withColumn("__key", col(leftKey))
      .withColumn("__time", leftTime)
      .withColumn("__side", lit(1)) // after right rows at equal time (≤)
      .withColumn("__tie", lit(Long.MinValue))
      .withColumn("__payload", lit(null).cast(payloadType))
    val r = right
      .withColumn("__key", col(rightKey))
      .withColumn("__time", rightTime)
      // a null right time can never satisfy time ≤ leftTime; unfiltered
      // it would sort first (nulls-first) and wrongly carry forward
      .filter(col("__time").isNotNull)
      .withColumn("__side", lit(0))
      .withColumn("__tie", col(rightTiebreak).cast("long"))
      .withColumn("__payload", payload)
      .select((leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__key"), col("__time"), col("__side"), col("__tie"),
          col("__payload"))): _*)
    val u = l.select((leftCols.map(col) ++
      Seq(col("__key"), col("__time"), col("__side"), col("__tie"),
        col("__payload"))): _*).unionByName(r)
    val w = Window.partitionBy("__key")
      .orderBy(col("__time"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    u.withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) :+ col("__match"): _*)
  }
}
