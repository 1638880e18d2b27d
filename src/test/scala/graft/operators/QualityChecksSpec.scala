package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Constraint semantics on a fixture with one known violation per
  * check, plus the all-clean edge (coalesce paths). */
class QualityChecksSpec extends SparkSpec {

  import spark.implicits._
  import QualityChecks._

  private def fixture = Seq(
    (Some(1), Some("O"), 10.0),
    (Some(2), Some("X"), 20.0), // bad status
    (None, Some("F"), 30.0), // null key
    (Some(4), Some("F"), -5.0), // out of range
    (Some(4), Some("P"), 40.0) // duplicate key
  ).toDF("k", "status", "amt")

  test("per-row checks fold into one aggregate per frame and count exactly") {
    val df = fixture
    val r = report(spark, Seq(
      notNull(df, "k"),
      acceptedValues(df, "status", Seq("O", "F", "P")),
      inRange(df, "amt", 0.0, 100.0)))
      .as[(String, Long)].collect().toMap
    assert(r("not_null:k") == 1)
    assert(r("accepted_values:status") == 1)
    assert(r("in_range:amt") == 1)
  }

  test("null values violate acceptedValues and inRange") {
    val df = Seq((Option.empty[String], Option.empty[java.lang.Double]))
      .toDF("status", "amt")
    val r = report(spark, Seq(
      acceptedValues(df, "status", Seq("O")),
      inRange(df, "amt", 0.0, 1.0))).as[(String, Long)].collect().toMap
    assert(r.values.forall(_ == 1L))
  }

  test("duplicates counts rows beyond the first per key; zero when unique") {
    assert(duplicates(fixture, Seq("k")).head().getLong(0) == 1)
    assert(duplicates(fixture.dropDuplicates("k"), Seq("k"))
      .head().getLong(0) == 0) // coalesce path on the empty sum is safe
  }

  test("checks over separately-loaded but identical sources share one group and count right") {
    val dir = java.nio.file.Files.createTempDirectory("graft_qc").toString
    fixture.write.mode("overwrite").parquet(dir)
    // two DISTINCT Dataset objects over the same table: canonicalized-
    // plan grouping must fold them into one aggregate without
    // mis-routing either check's violation column
    val a = spark.read.parquet(dir)
    val b = spark.read.parquet(dir)
    val r = report(spark, Seq(
      notNull(a, "k"),
      inRange(b, "amt", 0.0, 100.0))).as[(String, Long)].collect().toMap
    assert(r("not_null:k") == 1)
    assert(r("in_range:amt") == 1)
  }

  test("orphans is the anti-join count; zero when contained") {
    val parent = Seq(1, 2, 4).toDF("k")
    val child = Seq(1, 1, 3, 5).toDF("ck")
    assert(orphans(child, "ck", parent, "k").head().getLong(0) == 2)
    assert(orphans(parent.select(col("k").as("ck")), "ck", parent, "k")
      .head().getLong(0) == 0)
  }
}
