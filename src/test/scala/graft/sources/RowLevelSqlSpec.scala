package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.SnapshotTable

/** SQL MERGE INTO / UPDATE / DELETE against `USING graft` catalog
  * tables — the DSv2 row-level operation path (group-based
  * copy-on-write). Semantics must match the table API exactly; the
  * group replacement must be partition-scoped, not O(table). */
class RowLevelSqlSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_$tag").toString + "/table"

  private def withTable(tag: String, partitioned: Boolean)(
      body: (String, String, SnapshotTable) => Unit): Unit = {
    val path = tmp(tag)
    val name = s"graft_rls_$tag"
    val t = SnapshotTable(spark, path, "id",
      if (partitioned) Some("part") else None)
    t.create(Seq(
      (1, "a", 10.0, "p1"), (2, "b", 20.0, "p1"),
      (3, "c", 30.0, "p2"), (4, "d", 40.0, "p2"),
      (5, "e", 50.0, "p3")).toDF("id", "val", "amt", "part"))
    // primaryKey: an insert-only MERGE optimizes to AppendData, which
    // rides the table's INSERT INTO contract (merge by primaryKey)
    spark.sql(s"CREATE TABLE $name USING graft " +
      s"OPTIONS (primaryKey 'id') LOCATION '$path'")
    try body(name, path, t)
    finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  private def rows(name: String): Seq[(Int, String, Double, String)] = {
    spark.sql(s"REFRESH TABLE $name")
    spark.sql(s"SELECT id, val, amt, part FROM $name ORDER BY id")
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getDouble(2), r.getString(3)))
      .toSeq
  }

  test("MERGE INTO: update matched, insert unmatched (the reference's Delta MERGE from SQL)") {
    withTable("merge", partitioned = true) { (name, _, _) =>
      Seq((2, "B2", 22.0, "p1"), (6, "f", 60.0, "p3"))
        .toDF("id", "val", "amt", "part").createOrReplaceTempView("src_merge")
      spark.sql(
        s"""MERGE INTO $name t USING src_merge s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(rows(name) == Seq(
        (1, "a", 10.0, "p1"), (2, "B2", 22.0, "p1"),
        (3, "c", 30.0, "p2"), (4, "d", 40.0, "p2"),
        (5, "e", 50.0, "p3"), (6, "f", 60.0, "p3")))
    }
  }

  test("MERGE INTO: matched DELETE clause removes rows, unmatched survive") {
    withTable("mergedel", partitioned = true) { (name, _, _) =>
      Seq((1, "x"), (3, "y")).toDF("id", "tag")
        .createOrReplaceTempView("src_mergedel")
      spark.sql(
        s"""MERGE INTO $name t USING src_mergedel s ON t.id = s.id
           |WHEN MATCHED THEN DELETE""".stripMargin)
      assert(rows(name).map(_._1) == Seq(2, 4, 5))
    }
  }

  test("MERGE commit is partition-scoped: untouched partitions carry over by reference") {
    withTable("mergescope", partitioned = true) { (name, path, t) =>
      val before = t.candidateFiles().map(_.path).toSet
      Seq((1, "A1", 11.0, "p1")).toDF("id", "val", "amt", "part")
        .createOrReplaceTempView("src_scope")
      spark.sql(
        s"""MERGE INTO $name t USING src_scope s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
      val after = t.candidateFiles().map(_.path).toSet
      val carried = before intersect after
      // p2 and p3 files must carry over untouched; p1's must be replaced
      assert(carried == before.filterNot(_.contains("part=p1")),
        s"expected only p1 rewritten.\nbefore=$before\nafter=$after")
      assert(rows(name) == Seq(
        (1, "A1", 11.0, "p1"), (2, "b", 20.0, "p1"),
        (3, "c", 30.0, "p2"), (4, "d", 40.0, "p2"),
        (5, "e", 50.0, "p3")))
    }
  }

  test("SQL UPDATE: static partition predicate rewrites only that partition") {
    withTable("update", partitioned = true) { (name, _, t) =>
      val before = t.candidateFiles().map(_.path).toSet
      spark.sql(s"UPDATE $name SET amt = amt * 2 WHERE part = 'p2'")
      val after = t.candidateFiles().map(_.path).toSet
      assert((before intersect after) ==
        before.filterNot(_.contains("part=p2")),
        s"expected only p2 rewritten.\nbefore=$before\nafter=$after")
      assert(rows(name).map(r => (r._1, r._3)) ==
        Seq((1, 10.0), (2, 20.0), (3, 60.0), (4, 80.0), (5, 50.0)))
    }
  }

  test("SQL DELETE: rows go, history stays time-travelable") {
    withTable("delete", partitioned = true) { (name, path, _) =>
      spark.sql(s"DELETE FROM $name WHERE amt >= 40.0")
      assert(rows(name).map(_._1) == Seq(1, 2, 3))
      // v1 still readable after the copy-on-write commit
      assert(spark.read.format("graft").option("versionAsOf", 1)
        .load(path).count() == 5)
    }
  }

  test("row-level SQL works on unpartitioned tables too (full-group rewrite)") {
    withTable("unpart", partitioned = false) { (name, _, _) =>
      spark.sql(s"DELETE FROM $name WHERE id = 3")
      Seq((7, "g", 70.0, "p9")).toDF("id", "val", "amt", "part")
        .createOrReplaceTempView("src_unpart")
      spark.sql(
        s"""MERGE INTO $name t USING src_unpart s ON t.id = s.id
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(rows(name).map(_._1) == Seq(1, 2, 4, 5, 7))
    }
  }

  test("MERGE matching the whole table still equals the oracle semantics") {
    withTable("mergeall", partitioned = true) { (name, _, _) =>
      Seq((1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0), (5, 5.0))
        .toDF("id", "newamt").createOrReplaceTempView("src_all")
      spark.sql(
        s"""MERGE INTO $name t USING src_all s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET amt = s.newamt""".stripMargin)
      assert(rows(name).map(_._3) == Seq(1.0, 2.0, 3.0, 4.0, 5.0))
    }
  }

  test("SQL UPDATE prunes timestamp partitions via the writer's dir rendering, not toString") {
    val path = tmp("rlsts")
    val name = "graft_rls_ts"
    val src = Seq(
      (1, 10.0, java.sql.Timestamp.valueOf("2024-01-05 00:00:00")),
      (2, 20.0, java.sql.Timestamp.valueOf("2024-02-05 00:00:00")))
      .toDF("id", "amt", "day")
    SnapshotTable(spark, path, "id", Some("day")).create(src)
    spark.sql(s"CREATE TABLE $name USING graft " +
      s"OPTIONS (primaryKey 'id') LOCATION '$path'")
    try {
      // a toString-rendered filter value ('2024-01-05 00:00:00.0')
      // matches no Hive dir and would statically prune the TARGET
      // partition away: the update would silently touch 0 rows
      spark.sql(s"UPDATE $name SET amt = 11.0 " +
        "WHERE day = TIMESTAMP'2024-01-05 00:00:00'")
      spark.sql(s"REFRESH TABLE $name")
      assert(spark.sql(s"SELECT amt FROM $name WHERE id = 1")
        .head().getDouble(0) == 11.0,
        "timestamp-partition static pruning dropped the target partition")
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("row-level SQL writes enforce manifest-logged CHECK constraints") {
    val path = tmp("rlscheck")
    val name = "graft_rls_check"
    SnapshotTable(spark, path, "id", Some("part"),
      checkConstraints = Seq("amt_nonneg" -> (col("amt") >= 0.0)))
      .create(Seq((1, "a", 10.0, "p1"), (2, "b", 20.0, "p2"))
        .toDF("id", "val", "amt", "part"))
    spark.sql(s"CREATE TABLE $name USING graft " +
      s"OPTIONS (primaryKey 'id') LOCATION '$path'")
    try {
      def messages(x: Throwable): String =
        if (x == null) "" else x.getMessage + messages(x.getCause)
      val e = intercept[Exception] {
        spark.sql(s"UPDATE $name SET amt = -1.0 WHERE id = 1")
      }
      assert(messages(e).contains("CHECK constraint 'amt_nonneg'"))
      spark.sql(s"REFRESH TABLE $name")
      // nothing committed: the violating rewrite never became visible
      assert(spark.sql(s"SELECT amt FROM $name WHERE id = 1")
        .head().getDouble(0) == 10.0)
      // a compliant UPDATE through the same path still lands
      spark.sql(s"UPDATE $name SET amt = 11.0 WHERE id = 1")
      spark.sql(s"REFRESH TABLE $name")
      assert(spark.sql(s"SELECT amt FROM $name WHERE id = 1")
        .head().getDouble(0) == 11.0)
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("DML on a time-travel read is rejected") {
    withTable("travel", partitioned = true) { (name, path, t) =>
      t.delete(col("id") === 5)
      val info = new org.apache.spark.sql.connector.write.RowLevelOperationInfo {
        override def command() =
          org.apache.spark.sql.connector.write.RowLevelOperation.Command.DELETE
        override def options() =
          org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
      }
      val err = intercept[IllegalArgumentException] {
        new GraftTable(spark, path, Some(1L)).newRowLevelOperationBuilder(info)
      }
      assert(err.getMessage.contains("versionAsOf"))
    }
  }
}
