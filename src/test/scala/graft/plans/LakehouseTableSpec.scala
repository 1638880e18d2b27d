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

  test("all-new-PK upsert takes the append path: no existing file rewritten") {
    val path = tmp("append")
    val t = LakehouseTable(spark, path, "id", Some("part"))
    t.create(frame((1, "a", "p1"), (2, "b", "p2")))
    def dataFiles = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("part=")).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet")).map(f => f.getPath -> f.lastModified()).toMap
    val before = dataFiles
    t.upsert(frame((3, "c", "p1"), (4, "d", "p3"))) // no PK overlap
    val after = dataFiles
    // old files untouched (same path, same mtime) — appended, not rewritten
    before.foreach { case (p, m) =>
      assert(after.get(p).contains(m), s"pre-existing file rewritten: $p")
    }
    assert(after.size > before.size)
    val out = t.read.orderBy("id").collect()
      .map(r => (r.getAs[Int]("id"), r.getAs[String]("val"))).toSeq
    assert(out == Seq(1 -> "a", 2 -> "b", 3 -> "c", 4 -> "d"))
    // a duplicated retry of the same batch falls back to merge: no dupes
    t.upsert(frame((3, "c", "p1"), (4, "d", "p3")))
    assert(t.read.count() == 4)
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

  test("compact collapses accumulated small files, data unchanged") {
    val path = tmp("compact")
    val t = LakehouseTable(spark, path, "id", Some("part"))
    t.create(frame((1, "a", "p1"), (2, "b", "p1")))
    // append-style ingestion (e.g. a streaming sink) fragments the
    // partition into many small files; the MERGE paths don't, because
    // they rewrite touched partitions wholesale
    (3 to 6).foreach(i => frame((i, s"v$i", "p1")).write.mode("append")
      .partitionBy("part").parquet(path))
    def files(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(path)).count(_.getName.endsWith(".parquet"))
    }
    val before = files()
    val data = t.read.orderBy("id").collect().map(_.toString).toSeq
    t.compact()
    assert(files() < before, s"no compaction: $before -> ${files()}")
    assert(t.read.orderBy("id").collect().map(_.toString).toSeq == data)
  }

  test("schema-evolving upsert: new source column, kept rows read null") {
    val path = tmp("evolve")
    val t = LakehouseTable(spark, path, "id", Some("part"))
    t.create(frame((1, "a", "p1"), (2, "b", "p2")))
    val evolved = Seq((2, "B2", "p2", 7), (3, "c", "p1", 9))
      .toDF("id", "val", "part", "extra")
    t.upsert(evolved, evolveSchema = true)
    // untouched files lack the column: read with the evolved declared
    // schema so they surface it as null
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("val", StringType),
      StructField("extra", IntegerType), StructField("part", StringType)))
    val t2 = LakehouseTable(spark, path, "id", Some("part"), Some(schema))
    val out = t2.read.orderBy("id").collect()
      .map(r => (r.getAs[Int]("id"), r.getAs[String]("val"),
        if (r.isNullAt(2)) -1 else r.getAs[Int]("extra"))).toSeq
    assert(out == Seq((1, "a", -1), (2, "B2", 7), (3, "c", 9)))
  }

  test("crash recovery: stranded backup is restored before any operation") {
    val path = tmp("crash")
    val t = LakehouseTable(spark, path, "id", Some("part"))
    t.create(frame((1, "a", "p1"), (2, "b", "p2")))
    // simulate a death between the two swap renames: live gone, backup present
    val fsDir = new java.io.File(path)
    val backup = new java.io.File(path + ".backup")
    assert(fsDir.renameTo(backup))
    assert(!fsDir.exists())
    // any table operation must restore the backup, not rebuild from scratch
    t.upsert(frame((3, "c", "p1")))
    val out = t.read.orderBy("id").collect().map(_.getAs[Int]("id")).toSeq
    assert(out == Seq(1, 2, 3), s"history lost after crash: $out")
    assert(!backup.exists())
  }

  test("null partition values survive an upsert touching the null partition") {
    val path = tmp("nullpart")
    val t = LakehouseTable(spark, path, "id", Some("part"))
    t.create(Seq((1, "a", null: String), (2, "b", "p1")).toDF("id", "val", "part"))
    t.upsert(Seq((3, "c", null: String)).toDF("id", "val", "part"))
    val out = t.read.orderBy("id").collect()
      .map(r => (r.getAs[Int]("id"), r.getAs[String]("val"))).toSeq
    assert(out == Seq(1 -> "a", 2 -> "b", 3 -> "c"),
      s"null-partition rows lost: $out")
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

  test("null-PK rows merge idempotently instead of accumulating per re-run") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = true),
      StructField("val", StringType, nullable = true),
      StructField("part", StringType, nullable = true)))
    def df(rows: (Integer, String, String)*) =
      spark.createDataFrame(
        java.util.Arrays.asList(rows.map(r =>
          org.apache.spark.sql.Row(r._1, r._2, r._3)): _*), schema)
    // partitioned path
    val t = LakehouseTable(spark, tmp("lhnullpk"), "id", Some("part"))
    t.create(df((1, "a", "p1"), (null, "n0", "p1")))
    val batch = df((null, "n1", "p1"), (2, "b", "p1"))
    t.upsert(batch)
    t.upsert(batch) // re-run must be a no-op
    val got = t.read.collect()
      .map(r => (Option(r.get(0)), r.getString(1))).toSeq.sortBy(_._2)
    assert(got == Seq((Some(1), "a"), (Some(2), "b"), (None, "n1")),
      s"null-PK row duplicated or not merged: $got")
    // unpartitioned (staging-swap) path
    val u = LakehouseTable(spark, tmp("lhnullpk2"), "id")
    u.create(df((null, "n0", "p1")))
    u.upsert(df((null, "n1", "p1")))
    u.upsert(df((null, "n1", "p1")))
    assert(u.read.collect().map(_.getString(1)).toSeq == Seq("n1"))
  }
}
