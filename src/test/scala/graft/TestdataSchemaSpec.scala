package graft

import org.apache.spark.sql.types._

/** Testdata-contract regression gate (VERDICT r6 item 2): the driver
  * regenerates `/root/testdata` between rounds and has already changed
  * the on-disk encoding of `events.ts` once (TIMESTAMP(NANOS) →
  * timestamp[us] NTZ), which silently broke 17 queries. This suite pins
  * the loader contract — every table resolves through [[Tables.load]]
  * and the normalized event-time column is a real TimestampType — so
  * the NEXT testdata regeneration breaks one named test here instead of
  * a third of the query surface. */
class TestdataSchemaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every testdata table loads and has rows") {
    Tables.testTables.foreach { name =>
      val df = Tables.load(spark, dir, name)
      assert(df.schema.fields.nonEmpty, s"$name: empty schema")
      assert(df.limit(1).count() == 1L, s"$name: no rows")
    }
  }

  test("events.ts normalizes to TimestampType regardless of encoding") {
    val ev = Tables.load(spark, dir, "events")
    assert(ev.schema("ts").dataType == TimestampType,
      s"events.ts resolved as ${ev.schema("ts").dataType}; " +
        "Tables.normalizeEventTs must fold the on-disk encoding " +
        "(long nanos / timestamp[us] NTZ / LTZ) to TimestampType")
    // the expression shape every events query uses must ANALYZE —
    // this is exactly what broke in round 6
    val d = ev.select(
      org.apache.spark.sql.functions.date_format(
        Tables.eventsTs("ts"), "yyyy-MM-dd").as("date"))
      .limit(1).collect()
    assert(d.head.getString(0).matches("""\d{4}-\d{2}-\d{2}"""))
  }

  test("events.ts values are in a plausible epoch range") {
    // a unit mistake (nanos read as micros, micros as seconds) lands
    // centuries away — pin the decade, not the exact data
    import org.apache.spark.sql.functions._
    val yr = Tables.load(spark, dir, "events")
      .select(year(Tables.eventsTs("ts")).as("y"))
      .agg(min("y"), max("y")).head()
    val (lo, hi) = (yr.getInt(0), yr.getInt(1))
    assert(lo >= 1990 && hi <= 2100,
      s"events.ts years [$lo, $hi] outside sane range — " +
        "unit/encoding mismatch in normalizeEventTs?")
  }

  test("key analytic columns keep their expected types") {
    def dt(table: String, c: String): DataType =
      Tables.load(spark, dir, table).schema(c).dataType
    assert(dt("lineitem", "l_quantity").isInstanceOf[NumericType])
    assert(dt("lineitem", "l_shipdate") == TimestampType ||
      dt("lineitem", "l_shipdate") == DateType ||
      dt("lineitem", "l_shipdate") == TimestampNTZType)
    assert(dt("orders", "o_totalprice").isInstanceOf[NumericType])
    assert(dt("documents", "text") == StringType)
    assert(dt("embeddings", "embedding") match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
  }
}
