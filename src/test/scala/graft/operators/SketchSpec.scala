package graft.operators

import org.apache.spark.sql.functions._
import graft.{Queries, SparkSpec}

/** Error bounds for the sketch profile (no SQL oracle — DuckDB's
  * sketches use different algorithms/seeds, so the check is
  * approx-vs-exact on the same engine instead). */
class SketchSpec extends SparkSpec {

  test("approx_profile: HLL distincts within 5% of exact, quantiles within rank tolerance") {
    val dir = "/root/testdata/sf0.001"
    val row = Queries.approxProfile(spark, dir).head()
    val events = graft.Tables.load(spark, dir, "events")
    val exact = events.agg(
      countDistinct("user_id"), countDistinct("event_type"),
      expr("percentile(value, array(0.5, 0.95, 0.99))")).head()

    val approxUsers = row.getAs[Long]("approx_users").toDouble
    val exactUsers = exact.getLong(0).toDouble
    assert(math.abs(approxUsers - exactUsers) / exactUsers < 0.05,
      s"user HLL off: $approxUsers vs $exactUsers")
    // low-cardinality column: HLL is exact there
    assert(row.getAs[Long]("approx_types") == exact.getLong(1))

    val approxQ = Seq("value_p50", "value_p95", "value_p99")
      .map(c => row.getAs[Double](c))
    val exactQ = exact.getSeq[Double](2)
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
