package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SCD2 semantics: change closes + inserts, unchanged/absent keys are
  * untouched, re-applying a batch is a no-op, and version chains stitch
  * across batches. */
class Scd2Spec extends SparkSpec {

  import spark.implicits._

  private val t1 = lit("2020-01-01 00:00:00")
  private val t2 = lit("2020-06-01 00:00:00")
  private val t3 = lit("2021-01-01 00:00:00")

  private def dim(rows: (Int, String, Double)*) =
    rows.toSeq.toDF("k", "city", "balance")

  test("changed key closes + inserts; unchanged and absent keys untouched; new key inserts") {
    val h1 = Scd2.init(dim((1, "tokyo", 10.0), (2, "lima", 20.0), (3, "oslo", 30.0)),
      "k", Seq("city", "balance"), t1)
    assert(h1.filter(col(Scd2.CurrentCol)).count() == 3)

    val h2 = Scd2.applyBatch(h1,
      dim((1, "tokyo", 10.0), // unchanged
        (2, "lima", 25.0), // changed attribute
        (4, "kiev", 40.0)), // new key; 3 absent from batch
      "k", Seq("city", "balance"), t2).cache()

    assert(h2.count() == 5) // 3 original + closed-2's replacement + new 4
    val cur = h2.filter(col(Scd2.CurrentCol)).orderBy("k")
      .select("k", "balance").as[(Int, Double)].collect().toSeq
    assert(cur == Seq((1, 10.0), (2, 25.0), (3, 30.0), (4, 40.0)))
    val closed = h2.filter(!col(Scd2.CurrentCol)).select("k", "balance")
      .as[(Int, Double)].collect().toSeq
    assert(closed == Seq((2, 20.0)))
    // the closed row's effective_to equals the new row's effective_from
    val chain = h2.filter(col("k") === 2).orderBy(Scd2.FromCol)
      .select(col(Scd2.FromCol).cast("string"), col(Scd2.ToCol).cast("string"))
      .as[(String, String)].collect().toSeq
    assert(chain == Seq(
      ("2020-01-01 00:00:00", "2020-06-01 00:00:00"),
      ("2020-06-01 00:00:00", null)))
    // untouched keys keep their ORIGINAL effective_from
    assert(h2.filter(col("k") === 1).select(col(Scd2.FromCol).cast("string"))
      .head().getString(0) == "2020-01-01 00:00:00")
  }

  test("re-applying the same batch is a no-op (null-safe attribute compare)") {
    val withNull = Seq((1, Option("tokyo"), 10.0), (2, Option.empty[String], 20.0))
      .toDF("k", "city", "balance")
    val h1 = Scd2.init(withNull, "k", Seq("city", "balance"), t1)
    val h2 = Scd2.applyBatch(h1, withNull, "k", Seq("city", "balance"), t2)
    assert(h2.count() == 2)
    assert(h2.filter(col(Scd2.CurrentCol)).count() == 2)
    // null -> value IS a change
    val flipped = Seq((2, Option("quito"), 20.0)).toDF("k", "city", "balance")
    val h3 = Scd2.applyBatch(h2, flipped, "k", Seq("city", "balance"), t2)
    assert(h3.filter(col("k") === 2).count() == 2)
  }

  test("three batches: closed rows never rejoin, chains stay consistent") {
    val h1 = Scd2.init(dim((1, "tokyo", 10.0)), "k", Seq("city", "balance"), t1)
    val h2 = Scd2.applyBatch(h1, dim((1, "tokyo", 11.0)), "k", Seq("city", "balance"), t2)
    val h3 = Scd2.applyBatch(h2, dim((1, "tokyo", 12.0)), "k", Seq("city", "balance"), t3)
      .orderBy(Scd2.FromCol)
    val rows = h3.select(col("balance"), col(Scd2.ToCol).cast("string"),
      col(Scd2.CurrentCol)).as[(Double, String, Boolean)].collect().toSeq
    assert(rows == Seq(
      (10.0, "2020-06-01 00:00:00", false),
      (11.0, "2021-01-01 00:00:00", false),
      (12.0, null, true)))
  }
}
