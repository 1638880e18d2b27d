package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives. AQE's skew-join splitting covers most cases
  * at runtime; these are the explicit forms for when the skew is known
  * up front (one hot key holding a double-digit percentage of a 100 TB
  * fact) and the plan must not depend on runtime re-optimization.
  */
object Skew {

  /** Salted equi-join: the big side gets a deterministic pseudo-random
    * salt derived from its full row, the small side is replicated once
    * per salt, and the join key becomes (key, salt) — a hot key's rows
    * spread over `numSalts` shuffle partitions instead of one. Result is
    * row-identical to the plain equi-join (asserted by tests/oracle).
    *
    * Cost model: small side inflates ×numSalts (keep it broadcast-sized
    * per salt); the big side's shuffle becomes balanced. Inner joins
    * only (outer variants need null-extension care on the salt). */
  /** Per-row salt that spreads even BYTE-IDENTICAL duplicate rows: a
    * content hash would map a hot key's millions of identical rows
    * (heartbeats, default payloads) to ONE salt bucket, leaving the
    * skew exactly as bad while still paying the small-side
    * replication. `monotonically_increasing_id` is unique per row
    * within the job, and the salt only routes rows — results never
    * depend on its value. */
  private def rowSalt(numSalts: Int): Column =
    pmod(monotonically_increasing_id(), lit(numSalts.toLong)).cast("int")

  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     numSalts: Int = 8): DataFrame = {
    require(numSalts > 0, "numSalts must be positive")
    val saltedBig = big.withColumn("__salt", rowSalt(numSalts))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-stage (salted) aggregation: partial aggregate on (key, salt),
    * final combine on key. For algebraic aggregates Spark's own
    * partial+final hash aggregation already does this map-side — this
    * explicit form exists for aggregates composed of several columns
    * where a single reduce key is catastrophically hot. */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
                numSalts: Int = 8): DataFrame = {
    require(numSalts > 0, "numSalts must be positive")
    val salted = df.withColumn("__salt", rowSalt(numSalts))
    salted
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }
}
