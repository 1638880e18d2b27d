package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering: map each row to a position on a
  * space-filling curve over the cluster columns, then range-partition
  * and sort by that position. Files then cover small HYPER-RECTANGLES
  * of the key space instead of slabs of one column, so per-file min/max
  * stats ([[graft.plans.SnapshotTable]] manifest stats, or plain
  * parquet row-group stats) prune multi-column box predicates on EVERY
  * clustered column. A linear sort on (a, b) gives perfect pruning on
  * `a` and none on `b`; the curve trades a little of each for skipping
  * on all — the model behind Delta's `OPTIMIZE ... ZORDER BY`.
  *
  * Scale (100 TB): two passes — one cheap min/max aggregate to fix the
  * value frame (a handful of driver literals), then ONE range shuffle
  * of the data. The interleave itself is pure column algebra
  * (shifts/masks over a fixed bit budget), whole-stage codegen'd, no
  * UDF; nothing here is O(table) on the driver.
  */
object ZOrder {

  /** `c` normalized to an integer bucket in [0, 2^bits) against the
    * fixed [mn, mx] frame (values outside the frame clamp — new data
    * beyond the frame degrades clustering quality, never correctness). */
  private def bucket(c: Column, mn: Double, mx: Double, bits: Int): Column = {
    val buckets = (1L << bits) - 1
    val span = if (mx > mn) mx - mn else 1.0
    least(lit(buckets), greatest(lit(0L),
      floor((c.cast("double") - lit(mn)) / lit(span) * lit(buckets.toDouble))
        .cast("long")))
  }

  /** Morton-interleave the bucketed columns into one long: bit `b` of
    * column `i` lands at curve bit `b * k + i`, so successive curve
    * values cycle through all dimensions at each scale. */
  def zValue(framed: Seq[(Column, Double, Double)], bits: Int = 12): Column = {
    val k = framed.size
    require(k >= 1, "zValue needs at least one column")
    require(k * bits <= 60, s"z-value overflows a long: $k cols × $bits bits")
    val bucketed = framed.map { case (c, mn, mx) => bucket(c, mn, mx, bits) }
    val terms = for {
      b <- 0 until bits
      (bc, i) <- bucketed.zipWithIndex
    } yield shiftleft(shiftright(bc, b).bitwiseAND(lit(1L)), b * k + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** `c` as a monotone NUMBER the bucketer can frame: dates as days,
    * timestamps as micros (a cast to double can collapse nearby values
    * past 2^53 — harmless here, bucketing is lossy by design and only
    * clustering QUALITY depends on it), everything else through the
    * plain double cast. Date→double is not a legal Spark cast, so
    * without this a date×key z-order — the bread-and-butter
    * time-series layout — would not analyze. */
  private def asNumber(c: Column,
                       dt: org.apache.spark.sql.types.DataType): Column =
    dt match {
      case org.apache.spark.sql.types.DateType => unix_date(c).cast("double")
      case org.apache.spark.sql.types.TimestampType =>
        unix_micros(c).cast("double")
      case org.apache.spark.sql.types.TimestampNTZType =>
        // any monotone map works for clustering; the LTZ reinterpretation
        // is a constant shift at a fixed session zone
        unix_micros(c.cast("timestamp")).cast("double")
      case _ => c.cast("double")
    }

  /** Cluster `df` by the z-order curve over `cols` (numeric, string-
    * free orderable: date/timestamp/decimal included) into `numFiles`
    * range partitions (one output file each when written). The min/max
    * frame comes from the data in one aggregate pass. */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int,
              bits: Int = 12): DataFrame = {
    val nums = cols.map(c => asNumber(col(c), df.schema(c).dataType))
    val aggs = nums.flatMap(c => Seq(min(c), max(c)))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    // empty input or an all-null column has no frame: nothing to
    // cluster (getDouble on the null aggregate would NPE)
    if ((0 until 2 * cols.size).exists(row.isNullAt)) return df
    val framed = nums.zipWithIndex.map { case (c, i) =>
      (c, row.getDouble(2 * i), row.getDouble(2 * i + 1))
    }
    df.withColumn("__z", zValue(framed, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
