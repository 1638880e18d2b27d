package graft.operators

import org.apache.spark.sql.functions._
import graft.{Queries, SparkSpec}

/** Error bounds for the sketch profile (no SQL oracle — DuckDB's
  * sketches use different algorithms/seeds, so the check is
  * approx-vs-exact on the same engine instead). */
class SketchSpec extends SparkSpec {

  test("partition sketch index: incremental refresh equals full rebuild EXACTLY; untouched sketches carried") {
    import spark.implicits._
    val v1 = Seq(
      ("p1", 1L), ("p1", 2L), ("p1", 3L),
      ("p2", 2L), ("p2", 4L),
      ("p3", 5L), ("p3", 6L), ("p3", 7L)).toDF("part", "uid")
    val idx1 = PartitionSketches.build(v1, "part", "uid")
    // an upsert rewrites p2 (new rows replace old) — p1/p3 untouched
    val v2 = Seq(
      ("p1", 1L), ("p1", 2L), ("p1", 3L),
      ("p2", 2L), ("p2", 8L), ("p2", 9L),
      ("p3", 5L), ("p3", 6L), ("p3", 7L)).toDF("part", "uid")
    val touchedCurrent = v2.filter($"part" === "p2")
    val idx2 = PartitionSketches.refresh(idx1, touchedCurrent,
      Seq("p2").toDF("part"), "part", "uid")
    // HLL union is deterministic: the maintained index must answer
    // BIT-IDENTICALLY to a from-scratch rebuild, not approximately
    val full = PartitionSketches.build(v2, "part", "uid")
    val a = PartitionSketches.estimateTotal(idx2).head()
    val b = PartitionSketches.estimateTotal(full).head()
    assert(a.getLong(0) == 3 && b.getLong(0) == 3)
    assert(a.getLong(1) == b.getLong(1),
      s"incremental estimate ${a.getLong(1)} != full rebuild ${b.getLong(1)}")
    // at this cardinality HLL is exact: 8 distinct uids across v2
    assert(a.getLong(1) == v2.select("uid").distinct().count())
    // untouched partitions carried BY REFERENCE: sketch bytes identical
    val sk = (df: org.apache.spark.sql.DataFrame) => df
      .filter($"part" =!= "p2").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]]("sketch").toSeq).toMap
    assert(sk(idx2) == sk(idx1), "untouched partition sketches were rebuilt")
    // a touched partition whose rows were ALL removed must DROP its
    // sketch, not carry the stale one (touched is explicit for this)
    val idx3 = PartitionSketches.refresh(idx2,
      v2.filter($"part" === "none-left"), Seq("p3").toDF("part"),
      "part", "uid")
    val parts = idx3.select("part").collect().map(_.getString(0)).toSet
    assert(parts == Set("p1", "p2"), s"stale sketch survived: $parts")
    val est3 = PartitionSketches.estimateTotal(idx3).head()
    assert(est3.getLong(1) ==
      v2.filter($"part" =!= "p3").select("uid").distinct().count())
  }

  test("sketch_partition_maintenance query: in-plan HLL bound holds, exact count matches") {
    val dir = "/root/testdata/sf0.001"
    val row = Queries.sketchPartitionMaintenance(spark, dir).head()
    val ev = graft.Tables.load(spark, dir, "events")
    // the maintained table holds even event_ids plus div-3 ids of the
    // first nine days — recompute the exact distinct user count
    val exact = ev.filter(
      col("event_id") % 2 === 0 ||
        (col("event_id") % 3 === 0 &&
          date_format(graft.Tables.eventsTs("ts"), "yyyy-MM-dd") < "2024-01-10"))
      .select("user_id").distinct().count()
    assert(row.getAs[Boolean]("hll_ok"), "union-of-sketches estimate outside bound")
    assert(row.getAs[Long]("exact_users") == exact)
    assert(row.getAs[Long]("n_partitions") > 1)
  }

  test("approx_profile: in-plan sketch-bound assertions hold and exact counts match") {
    val dir = "/root/testdata/sf0.001"
    val row = Queries.approxProfile(spark, dir).head()
    val events = graft.Tables.load(spark, dir, "events")
    val exact = events.agg(
      countDistinct("user_id"), countDistinct("event_type")).head()
    // the entry's own error-bound booleans are the contract
    Seq("hll_users_ok", "hll_types_ok", "p50_ok", "p95_ok", "p99_ok")
      .foreach(c => assert(row.getAs[Boolean](c), s"$c is false"))
    assert(row.getAs[Long]("exact_users") == exact.getLong(0))
    assert(row.getAs[Long]("exact_types") == exact.getLong(1))
  }

  test("HLL distincts within 5% of exact, quantiles within rank tolerance") {
    val dir = "/root/testdata/sf0.001"
    val events = graft.Tables.load(spark, dir, "events")
    // the raw sketch aggregates, independent of the entry's thresholds
    val row = events.agg(
      approx_count_distinct("user_id").as("approx_users"),
      approx_count_distinct("event_type").as("approx_types"),
      expr("approx_percentile(value, array(0.5, 0.95, 0.99), 10000)")
        .as("q")).head()
    val exact = events.agg(
      countDistinct("user_id"), countDistinct("event_type")).head()

    val approxUsers = row.getAs[Long]("approx_users").toDouble
    val exactUsers = exact.getLong(0).toDouble
    assert(math.abs(approxUsers - exactUsers) / exactUsers < 0.05,
      s"user HLL off: $approxUsers vs $exactUsers")
    // low-cardinality column: HLL is exact there
    assert(row.getAs[Long]("approx_types") == exact.getLong(1))

    val approxQ = row.getSeq[Double](2)
    // approx_percentile guarantees rank accuracy; translate to a value
    // check against a small neighborhood of the exact quantile
    val values = events.select("value").orderBy("value")
      .collect().map(_.getDouble(0))
    approxQ.zip(Seq(0.5, 0.95, 0.99)).foreach { case (q, p) =>
      val rank = values.indexWhere(_ >= q) match {
        case -1 => values.length
        case i => i
      }
      val target = p * values.length
      assert(math.abs(rank - target) / values.length < 0.02,
        s"quantile p=$p: approx $q sits at rank $rank, expected ~$target")
    }
  }
}
