package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.SnapshotTable

/** The registered `format("graft")` source: short-name resolution,
  * round-trip equality, versionAsOf time travel, filter correctness on
  * a skipping-enabled table, and column pruning down to zero columns. */
class GraftSourceSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_$tag").toString + "/table"

  test("short name resolves; reads equal the table API; versionAsOf travels") {
    val path = tmp("src")
    val t = SnapshotTable(spark, path, "id", Some("part"))
    t.create(Seq((1, "a", "p1"), (2, "b", "p2")).toDF("id", "val", "part"))
    t.upsert(Seq((2, "B2", "p2"), (3, "c", "p3")).toDF("id", "val", "part"))
    val cur = spark.read.format("graft").load(path)
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(cur.toSeq == Seq((1, "a"), (2, "B2"), (3, "c")))
    val v1 = spark.read.format("graft").option("versionAsOf", 1).load(path)
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(v1.toSeq == Seq((1, "a"), (2, "b")))
  }

  test("branch option reads the branch line; branch writes are refused") {
    val path = tmp("srcbranch")
    val t = SnapshotTable(spark, path, "id", Some("part"))
    t.create(Seq((1, "a", "p1")).toDF("id", "val", "part"))
    t.createBranch("dev")
    t.forBranch("dev").upsert(Seq((2, "b", "p2")).toDF("id", "val", "part"))
    val branchRows = spark.read.format("graft").option("branch", "dev")
      .load(path).orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(branchRows == Seq(1 -> "a", 2 -> "b"))
    assert(spark.read.format("graft").load(path).count() == 1)
    // versionAsOf composes: the branch's own v1 is the fork point
    assert(spark.read.format("graft").option("branch", "dev")
      .option("versionAsOf", 1).load(path).count() == 1)
    val e = intercept[Exception](
      Seq((9, "z", "p9")).toDF("id", "val", "part")
        .write.format("graft").option("branch", "dev")
        .option("primaryKey", "id").mode("append").save(path))
    assert(e.getMessage.contains("forBranch"), e.getMessage)
  }

  test("branch options are case-insensitive; bad branch names fail clearly") {
    val path = tmp("srcbrci")
    val t = SnapshotTable(spark, path, "id", Some("part"))
    t.create(Seq((1, "a", "p1")).toDF("id", "val", "part"))
    t.createBranch("dev")
    t.forBranch("dev").upsert(Seq((2, "b", "p2")).toDF("id", "val", "part"))
    // a case-variant key must hit the branch, not silently read MAIN
    assert(spark.read.format("graft").option("BRANCH", "dev")
      .load(path).count() == 2)
    // ...and must not bypass the branch write guard either
    val w = intercept[Exception](
      Seq((9, "z", "p9")).toDF("id", "val", "part")
        .write.format("graft").option("BRANCH", "dev")
        .option("primaryKey", "id").mode("append").save(path))
    assert(w.getMessage.contains("forBranch"), w.getMessage)
    // a typo'd branch fails naming the branch, not the table
    val e = intercept[IllegalArgumentException](
      spark.read.format("graft").option("branch", "dve").load(path).count())
    assert(e.getMessage.contains("no branch 'dve'") &&
      e.getMessage.contains("dev"), e.getMessage)
  }

  test("with a branch option, every pin resolves on the branch line") {
    val path = tmp("srcbrpin")
    val t = SnapshotTable(spark, path, "id", Some("part"))
    t.create(Seq((1, "a", "p1")).toDF("id", "val", "part"))
    t.tag("mainrel") // main's tag namespace
    t.createBranch("dev")
    val dev = t.forBranch("dev")
    dev.upsert(Seq((2, "b", "p2")).toDF("id", "val", "part")) // dev v2
    dev.tag("devrel") // pins dev v2, in the BRANCH's namespace
    assert(spark.read.format("graft").option("branch", "dev")
      .option("tagAsOf", "devrel").load(path).count() == 2)
    // a MAIN tag is not visible on the branch line — resolving it and
    // pinning the number onto dev's versions would read garbage
    val e = intercept[IllegalArgumentException](
      spark.read.format("graft").option("branch", "dev")
        .option("tagAsOf", "mainrel").load(path).count())
    assert(e.getMessage.contains("no tag"), e.getMessage)
  }

  test("tagAsOf pins a tagged snapshot; pin options are mutually exclusive") {
    val path = tmp("srctag")
    val t = SnapshotTable(spark, path, "id", Some("part"))
    t.create(Seq((1, "a", "p1")).toDF("id", "val", "part"))
    t.tag("first")
    t.upsert(Seq((1, "A2", "p1")).toDF("id", "val", "part"))
    assert(spark.read.format("graft").option("tagAsOf", "first").load(path)
      .select("val").head().getString(0) == "a")
    intercept[IllegalArgumentException](spark.read.format("graft")
      .option("tagAsOf", "first").option("versionAsOf", 1)
      .load(path).collect())
    val e = intercept[IllegalArgumentException](spark.read.format("graft")
      .option("tagAsOf", "ghost").load(path).collect())
    assert(e.getMessage.contains("no tag"), e.getMessage)
  }

  test("range filter on a stats column is correct (pruning skips files, never rows)") {
    val path = tmp("srcskip")
    val t = SnapshotTable(spark, path, "k",
      statsCols = Seq("k"), clusterBy = Seq("k"), clusterFiles = 8)
    t.create(spark.range(0, 1000).select($"id".as("k"),
      ($"id" * 2).as("v")))
    val total = t.candidateFiles(("k", Long.MinValue, Long.MaxValue)).size
    assert(t.candidateFiles(("k", 100L, 199L)).size < total,
      "fixture not skippable — the pruning path would go unexercised")
    val got = spark.read.format("graft").load(path)
      .filter($"k" >= 100 && $"k" <= 199)
      .agg(count(lit(1)), sum($"v")).head()
    assert(got.getLong(0) == 100)
    assert(got.getLong(1) == (100L until 200L).map(_ * 2).sum)
    // one-sided + equality shapes stay correct too
    assert(spark.read.format("graft").load(path)
      .filter($"k" < 10).count() == 10)
    assert(spark.read.format("graft").load(path)
      .filter($"k" === 500).count() == 1)
  }

  test("sink: save modes map onto atomic commits (append merges, overwrite replaces, history survives)") {
    val path = tmp("srcsink")
    def w(rows: Seq[(Int, String)], mode: String) =
      rows.toDF("id", "val").write.format("graft")
        .option("primaryKey", "id").mode(mode).save(path)
    w(Seq((1, "a"), (2, "b")), "errorifexists")
    w(Seq((2, "B2"), (3, "c")), "append") // MERGE by pk
    val afterAppend = spark.read.format("graft").load(path)
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(afterAppend.toSeq == Seq((1, "a"), (2, "B2"), (3, "c")))
    w(Seq((9, "z")), "overwrite") // atomic full replace
    val afterOverwrite = spark.read.format("graft").load(path)
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(afterOverwrite.toSeq == Seq((9, "z")))
    // prior versions stay time-travelable across the replace
    val v2 = spark.read.format("graft").option("versionAsOf", 2).load(path)
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(v2.toSeq == Seq((1, "a"), (2, "B2"), (3, "c")))
    intercept[IllegalStateException](w(Seq((1, "x")), "errorifexists"))
    w(Seq((1, "x")), "ignore") // no-op on an existing table
    assert(spark.read.format("graft").load(path).count() == 1)
  }

  test("sink: overwrite/errorifexists/ignore need no primaryKey (only Append merges)") {
    val path = tmp("srcnopk")
    def w(rows: Seq[(Int, String)], mode: String) =
      rows.toDF("id", "val").write.format("graft").mode(mode).save(path)
    w(Seq((1, "a")), "errorifexists") // create without a merge key
    w(Seq((2, "b")), "overwrite") // replace without a merge key
    w(Seq((9, "x")), "ignore") // no-op, no key demanded
    assert(spark.read.format("graft").load(path)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((2, "b")))
    // keyless Append is a BLIND append: duplicate ids are kept, the
    // prior version's files carry over by reference
    w(Seq((2, "dup"), (3, "c")), "append")
    assert(spark.read.format("graft").load(path)
      .orderBy("id", "val").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((2, "b"), (2, "dup"), (3, "c")))
  }

  test("timestampAsOf ISO literal resolves in the SESSION time zone, not JVM default") {
    val path = tmp("srctz")
    val t = SnapshotTable(spark, path, "id")
    t.create(Seq((1, "a")).toDF("id", "val"))
    Thread.sleep(1100) // local FS mtime is second-granular
    t.upsert(Seq((2, "b")).toDF("id", "val"))
    val v1CommitMs = t.history.find(_._1 == 1L).get._2
    // pick a wall-clock instant strictly between v1 and v2, render it
    // as an ISO local-datetime in a session zone FAR from the JVM
    // default (UTC here): if the source parsed in the JVM zone the
    // instant would shift by the offset and resolve the wrong version
    val zone = "Pacific/Kiritimati" // UTC+14, no DST
    val iso = java.time.Instant.ofEpochMilli(v1CommitMs + 500)
      .atZone(java.time.ZoneId.of(zone)).toLocalDateTime.toString
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", zone)
      assert(spark.read.format("graft")
        .option("timestampAsOf", iso).load(path).count() == 1,
        s"ISO literal $iso in session zone $zone must pin v1")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
    // same literal parsed under the (UTC) default session zone lands
    // 14h LATER — after v2's commit — proving the zone is read from
    // the session at resolve time, not baked in at parse-literal time
    assert(spark.read.format("graft")
      .option("timestampAsOf", iso).load(path).count() == 2,
      s"ISO literal $iso under UTC session zone must land after v2")
  }

  test("SQL catalog: CREATE TABLE ... USING graft resolves the snapshot by name") {
    val path = tmp("srcsql")
    val t = SnapshotTable(spark, path, "id")
    t.create(Seq((1, "a"), (2, "b")).toDF("id", "val"))
    spark.sql(s"CREATE TABLE graft_sql_spec USING graft LOCATION '$path'")
    try {
      val rows = spark.sql(
        "SELECT id, val FROM graft_sql_spec ORDER BY id").collect()
        .map(r => (r.getInt(0), r.getString(1)))
      assert(rows.toSeq == Seq((1, "a"), (2, "b")))
      // a committed upsert is visible to the SQL name without DDL churn
      t.upsert(Seq((3, "c")).toDF("id", "val"))
      spark.sql("REFRESH TABLE graft_sql_spec")
      assert(spark.sql("SELECT count(*) FROM graft_sql_spec")
        .head().getLong(0) == 3)
    } finally spark.sql("DROP TABLE IF EXISTS graft_sql_spec")
  }

  test("SQL DML: INSERT INTO merges by primaryKey; INSERT OVERWRITE replaces") {
    val path = tmp("srcinsert")
    val t = SnapshotTable(spark, path, "id")
    t.create(Seq((1, "a"), (2, "b")).toDF("id", "val"))
    spark.sql(
      s"""CREATE TABLE graft_sql_ins USING graft
         |OPTIONS (primaryKey 'id') LOCATION '$path'""".stripMargin)
    try {
      // merge semantics: existing key 2 replaced, key 3 inserted
      spark.sql("INSERT INTO graft_sql_ins VALUES (2, 'B2'), (3, 'c')")
      spark.sql("REFRESH TABLE graft_sql_ins")
      assert(spark.sql("SELECT id, val FROM graft_sql_ins ORDER BY id")
        .collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
        Seq((1, "a"), (2, "B2"), (3, "c")))
      // atomic full replace, history retained
      spark.sql("INSERT OVERWRITE graft_sql_ins VALUES (9, 'z')")
      spark.sql("REFRESH TABLE graft_sql_ins")
      assert(spark.sql("SELECT id, val FROM graft_sql_ins")
        .collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
        Seq((9, "z")))
      assert(spark.read.format("graft").option("versionAsOf", 2).load(path)
        .count() == 3)
    } finally spark.sql("DROP TABLE IF EXISTS graft_sql_ins")
  }

  test("partitioned table through the source: values survive, INSERT keeps layout") {
    val path = tmp("srcpart")
    SnapshotTable(spark, path, "id", Some("part"))
      .create(Seq((1, "a", "p1"), (2, "b", "p2")).toDF("id", "val", "part"))
    // the source handle never states partitionCol — values must be real
    assert(spark.read.format("graft").load(path).orderBy("id")
      .select("part").as[String].collect().toSeq == Seq("p1", "p2"))
    spark.sql(
      s"""CREATE TABLE graft_sql_part USING graft
         |OPTIONS (primaryKey 'id') LOCATION '$path'""".stripMargin)
    try {
      spark.sql("INSERT INTO graft_sql_part VALUES (3, 'c', 'p3')")
      spark.sql("REFRESH TABLE graft_sql_part")
      assert(spark.sql("SELECT part FROM graft_sql_part ORDER BY id")
        .as[String].collect().toSeq == Seq("p1", "p2", "p3"))
      assert(new java.io.File(s"$path/data/part=p3").exists(),
        "SQL INSERT lost the partition layout")
    } finally spark.sql("DROP TABLE IF EXISTS graft_sql_part")
  }

  test("sink: overwrite with partitionOverwriteMode=dynamic replaces only the batch's partitions") {
    val path = tmp("srcdynover")
    SnapshotTable(spark, path, "id", Some("part"))
      .create(Seq((1, "old1", "p1"), (2, "old2", "p2"))
        .toDF("id", "val", "part"))
    Seq((9, "new", "p1")).toDF("id", "val", "part")
      .write.format("graft").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").save(path)
    assert(spark.read.format("graft").load(path).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .toSeq == Seq((2, "old2", "p2"), (9, "new", "p1")))
    // a plain overwrite still replaces the whole table
    Seq((7, "all", "p9")).toDF("id", "val", "part")
      .write.format("graft").mode("overwrite").save(path)
    assert(spark.read.format("graft").load(path).count() == 1)
  }

  test("SQL INSERT OVERWRITE honors partitionOverwriteMode=dynamic like save() does") {
    val path = tmp("srcinsdyn")
    SnapshotTable(spark, path, "id", Some("part"))
      .create(Seq((1, "old1", "p1"), (2, "old2", "p2"))
        .toDF("id", "val", "part"))
    val tbl = "graft_insdyn_t"
    spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
    spark.sql(
      s"""CREATE TABLE `$tbl` USING graft
         |OPTIONS (path '$path', partitionCol 'part',
         |         partitionOverwriteMode 'dynamic')""".stripMargin)
    spark.sql(s"INSERT OVERWRITE TABLE `$tbl` VALUES (9, 'new', 'p1')")
    // p2 must survive: only the batch's partition is replaced
    assert(spark.read.format("graft").load(path).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .toSeq == Seq((2, "old2", "p2"), (9, "new", "p1")))
    spark.sql(s"DROP TABLE `$tbl`")
  }

  test("column pruning: zero-column count and single-column projection") {
    val path = tmp("srcprune")
    val t = SnapshotTable(spark, path, "id")
    t.create(Seq((1, "a"), (2, "b")).toDF("id", "val"))
    assert(spark.read.format("graft").load(path).count() == 2)
    assert(spark.read.format("graft").load(path)
      .select("val").orderBy("val").as[String].collect().toSeq ==
      Seq("a", "b"))
  }
}
