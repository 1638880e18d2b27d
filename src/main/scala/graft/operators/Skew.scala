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
    if (numSalts == 1) return big.join(small, Seq(key))
    val saltedBig = big.withColumn("__salt", rowSalt(numSalts))
    // repartition BEFORE exploding, to the session's FULL shuffle
    // width: a dim that fits a couple of input splits would otherwise
    // push numSalts × |small| replicated rows through one or two
    // shuffle-write tasks — the r14 scale smoke measured exactly that
    // serialized explode as the salted join's critical path (its max
    // task beat the unsalted straggler it was supposed to cure), and
    // repartitioning to only numSalts tasks still left ~|small| rows
    // per writer. The extra small-side shuffle is O(|small|), paid
    // once, and spread over every core.
    val parts = big.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val replicatedSmall = small.repartition(math.max(numSalts, parts))
      .withColumn("__salt", explode(sequence(lit(0), lit(numSalts - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Pick the salt count the measured skew actually warrants — or 1
    * (don't salt) when it doesn't. Salting is a TAX: the small side
    * replicates ×salts and the big side's shuffle rows widen by the
    * salt column, so it only pays while the hot key's reduce partition
    * still dominates the stage. The decision model: with `parts`
    * shuffle partitions a balanced task carries ~1/parts of the rows
    * and the hot partition carries `hotShare`, i.e. the straggler runs
    * `hotShare × parts` balanced-tasks long; slice it with
    * ceil(hotShare·parts / targetOver) salts so the worst salted
    * partition lands within `targetOver` of balanced, and refuse
    * entirely when it is ALREADY within targetOver (the r14 regime:
    * fixed ×32 salting lost 1.6× to the plain join it was "fixing").
    * The estimate reads a `sampleFraction` sample of the big side's
    * key column only — one narrow partial-agg job, O(sample) — and is
    * deliberately coarse: the decision needs the hot share's ORDER,
    * not its third digit. */
  /** Sampled skew of `big`'s key column: (hot key's row share,
    * estimated total rows). One narrow partial-agg job over a
    * `sampleFraction` sample; fixed seed because the result picks the
    * PHYSICAL PLAN and an unseeded sample near a decision boundary
    * would flip plans (and their timings) run to run. */
  def sampleSkew(big: DataFrame, key: String,
                 sampleFraction: Double = 0.01): (Double, Long) = {
    require(sampleFraction > 0 && sampleFraction <= 1, "bad fraction")
    val top = big.select(col(key))
      .sample(withReplacement = false, sampleFraction, seed = 42L)
      .groupBy(col(key)).agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("mx"), sum(col("c")).as("n"))
      .head()
    if (top.isNullAt(0) || top.getLong(1) == 0L) (0.0, 0L)
    else (top.getLong(0).toDouble / top.getLong(1).toDouble,
      (top.getLong(1) / sampleFraction).toLong)
  }

  private def saltsFor(spark: org.apache.spark.sql.SparkSession,
                       hotShare: Double, targetOver: Double,
                       maxSalts: Int): Int = {
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val over = hotShare * parts
    if (over <= targetOver) 1
    else math.min(maxSalts, math.ceil(over / targetOver).toInt)
  }

  def chooseSalts(big: DataFrame, key: String,
                  sampleFraction: Double = 0.01,
                  targetOver: Double = 2.0,
                  maxSalts: Int = 64): Int = {
    val (hotShare, _) = sampleSkew(big, key, sampleFraction)
    saltsFor(big.sparkSession, hotShare, targetOver, maxSalts)
  }

  /** Would AQE's runtime skew-join split handle this skew under the
    * SESSION'S CURRENT thresholds? AQE splits a sort-merge join's
    * skewed partition when its shuffle size ≥ max(threshold,
    * factor × median) — when that fires it beats explicit salting
    * (it slices the one hot partition at zero replication tax; the
    * r17 scale smoke measured forced-AQE max task 2.96 s vs salted
    * 4.73 s on identical inputs). When it does NOT fire — the default
    * 256 MB threshold vs an 80 MB-wire hot partition in that same
    * smoke — the unsalted straggler runs 2× the salted one, and
    * explicit salting is the only fix. So the decision needs the hot
    * partition's WIRE size under the session's thresholds.
    *
    * The estimate: sampled rows × the join projection's default row
    * width / 4 (row-shuffle lz4 compression, measured ≈4× on packed
    * numeric rows — within 10% of the smoke's observed 80 MB). The
    * deferral demands a 2× margin over the threshold because the two
    * mispredictions are asymmetric: deferring when AQE then does not
    * fire re-inherits the full straggler; salting when AQE would have
    * fired only pays the bounded replication tax. */
  def aqeCoversJoinSkew(big: DataFrame, hotShare: Double,
                        estRows: Long): Boolean = {
    val conf = big.sparkSession.conf
    def bytesConf(k: String, dflt: String): Long =
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        conf.get(k, dflt))
    val enabled =
      conf.get("spark.sql.adaptive.enabled", "true").toBoolean &&
        conf.get("spark.sql.adaptive.skewJoin.enabled", "true").toBoolean
    if (!enabled || hotShare <= 0 || estRows <= 0) false
    else {
      val threshold = bytesConf(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "256MB")
      val factor = conf.get(
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5.0").toDouble
      val parts = conf.get("spark.sql.shuffle.partitions").toInt
      val rowBytes = big.schema.defaultSize.toDouble / 4
      val hotWire = hotShare * estRows * rowBytes
      val medianWire = (1.0 - hotShare) * estRows * rowBytes / parts
      hotWire >= 2.0 * threshold && hotWire >= factor * medianWire
    }
  }

  /** [[chooseSalts]] + [[saltedEquiJoin]], AQE-aware: salt only as
    * hard as the sampled skew warrants, falling through to the plain
    * equi-join when the skew is near-balanced OR when the session's
    * AQE skew-join thresholds will demonstrably split it at runtime
    * ([[aqeCoversJoinSkew]] — the r18 re-adjudication: AQE's split is
    * strictly cheaper than salting WHEN IT FIRES, and explicit
    * salting's regime is the sub-threshold logical skew AQE's byte
    * heuristics miss). */
  def saltedEquiJoinAuto(big: DataFrame, small: DataFrame, key: String,
                         sampleFraction: Double = 0.01,
                         targetOver: Double = 2.0,
                         maxSalts: Int = 64): DataFrame = {
    val (hotShare, estRows) = sampleSkew(big, key, sampleFraction)
    val salts =
      if (aqeCoversJoinSkew(big, hotShare, estRows)) 1
      else saltsFor(big.sparkSession, hotShare, targetOver, maxSalts)
    saltedEquiJoin(big, small, key, salts)
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
