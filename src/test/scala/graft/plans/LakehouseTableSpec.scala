package graft.plans

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** MERGE-upsert emulation semantics (K1/K2; reference semantics from
  * orders_etl.py:65-74): matched rows replaced, unmatched source inserted,
  * unmatched target kept, re-running the same batch is a no-op. */
class LakehouseTableSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_$tag").toString + "/table"

  private def frame(rows: (Int, String, String)*) =
    rows.toDF("id", "val", "part")

  test("create then read round-trips, partitioned") {
    val path = tmp("create")
    val t = LakehouseTable(spark, path, "id", Some("part"))
    assert(!t.exists)
    t.create(frame((1, "a", "p1"), (2, "b", "p2")))
    assert(t.exists)
    assert(t.read.count() == 2)
  }

  test("partition-scoped upsert: update + insert + untouched partition kept") {
    val path = tmp("upsert")
    val t = LakehouseTable(spark, path, "id", Some("part"))
    t.create(frame((1, "a", "p1"), (2, "b", "p2"), (3, "c", "p2")))
    t.upsert(frame((2, "B2", "p2"), (4, "d", "p2")))
    val out = t.read.orderBy("id").collect()
      .map(r => (r.getAs[Int]("id"), r.getAs[String]("val"))).toSeq
    assert(out == Seq(1 -> "a", 2 -> "B2", 3 -> "c", 4 -> "d"))
  }

  test("upsert is idempotent: same batch twice changes nothing") {
    val path = tmp("idem")
    val t = LakehouseTable(spark, path, "id", Some("part"))
    t.create(frame((1, "a", "p1"), (2, "b", "p2")))
    val batch = frame((2, "B", "p2"), (3, "c", "p1"))
    t.upsert(batch)
    val first = t.read.orderBy("id").collect().map(_.toString).toSeq
    t.upsert(batch)
    val second = t.read.orderBy("id").collect().map(_.toString).toSeq
    assert(first == second)
    assert(first.size == 3)
  }

  test("unpartitioned upsertFull merges and leaves no staging/backup dirs") {
    val path = tmp("full")
    val t = LakehouseTable(spark, path, "id")
    t.create(Seq((1, "a"), (2, "b")).toDF("id", "val"))
    t.upsert(Seq((2, "B"), (3, "c")).toDF("id", "val"))
    val out = t.read.orderBy("id").collect()
      .map(r => (r.getAs[Int]("id"), r.getAs[String]("val"))).toSeq
    assert(out == Seq(1 -> "a", 2 -> "B", 3 -> "c"))
    assert(!new java.io.File(path + ".staging").exists())
    assert(!new java.io.File(path + ".backup").exists())
  }

  test("declared schema keeps a string partition column string across round-trips") {
    val path = tmp("schema")
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("date", StringType)))
    val t = LakehouseTable(spark, path, "id", Some("date"), Some(schema))
    t.create(Seq((1, "2025-04-01"), (2, "2025-04-02")).toDF("id", "date"))
    assert(t.read.schema("date").dataType == StringType)
    t.upsert(Seq((3, "2025-04-03")).toDF("id", "date"))
    assert(t.read.schema("date").dataType == StringType)
    assert(t.read.count() == 3)
  }

  test("partition pruning: partition filter reaches the scan") {
    val path = tmp("prune")
    val t = LakehouseTable(spark, path, "id", Some("part"))
    t.create(frame((1, "a", "p1"), (2, "b", "p2"), (3, "c", "p3")))
    val plan = t.read.filter(col("part") === "p2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(part"),
      s"partition filter not pushed:\n$plan")
  }
}
