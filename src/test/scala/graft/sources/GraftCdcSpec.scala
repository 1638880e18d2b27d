package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.plans.SnapshotTable

/** Change-feed reads (`readChangeFeed`): batch spans and the streaming
  * source. The correctness anchor is the batch CDC contract: per
  * commit, the delivered images NET of canceling (before, after)
  * pairs must equal [[SnapshotTable.changesDelta]] exactly — across
  * appends, upserts (rewrites), copy-on-write deletes and
  * merge-on-read deletion-vector growth. */
class GraftCdcSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_$tag").toString + "/table"

  private val img = SnapshotTable.ImageCol
  private val ver = SnapshotTable.CommitVersionCol

  /** Signed multiset net of an image frame: rows surviving pair
    * cancellation, exploded back to (row, image, multiplicity). */
  private def net(images: DataFrame): Seq[(Int, String, String, String)] = {
    val dataCols = images.columns.filterNot(c => c == img || c == ver).toSeq
    images
      .withColumn("__s", when(col(img) === "after", 1L).otherwise(-1L))
      .groupBy(dataCols.map(col): _*).agg(sum("__s").as("__d"))
      .filter(col("__d") =!= 0L)
      .select(col("id"), col("val"), col("part"),
        when(col("__d") > 0, "after").otherwise("before").as("image"),
        abs(col("__d")).cast("int").as("n"))
      .collect().flatMap(r => Seq.fill(r.getInt(4))(
        (r.getInt(0), r.getString(1), r.getString(2), r.getString(3))))
      .toSeq.sorted
  }

  private def asImages(df: DataFrame): Seq[(Int, String, String, String)] =
    df.select(col("id"), col("val"), col("part"), col(img))
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSeq.sorted

  /** A table with one commit of each mutation kind. */
  private def history(tag: String): (String, SnapshotTable) = {
    val path = tmp(tag)
    val t = SnapshotTable(spark, path, "id", Some("part"))
    t.create(Seq((1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2"),
      (4, "d", "p2")).toDF("id", "val", "part"))           // v1
    t.upsert(Seq((2, "B2", "p1"), (5, "e", "p2"))
      .toDF("id", "val", "part"))                          // v2 rewrite+insert
    t.deleteMoR(col("id") === 3)                           // v3 DV growth
    t.delete(col("id") === 1)                              // v4 CoW delete
    (path, t)
  }

  test("batch span: per-commit net equals changesDelta for every mutation kind") {
    val (path, t) = history("cdcbatch")
    val feed = spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", 1).load(path)
    assert(feed.columns.endsWith(Array(img, ver)))
    (2L to 4L).foreach { v =>
      val streamed = feed.filter(col(ver) === v).drop(ver)
      assert(net(streamed) == asImages(t.changesDelta(v - 1, v)),
        s"net images at v$v diverge from changesDelta")
    }
  }

  test("batch startingVersion=0 walks from v1 with TRUE per-commit attribution") {
    val (path, t) = history("cdczero")
    val feed = spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", 0).load(path)
    // v1's images attribute to v1 (the collapse stamped everything ve)
    val v1 = feed.filter(col(ver) === 1L)
    assert(v1.count() == 4 &&
      v1.select(img).distinct().head().getString(0) == "after",
      "v1 must deliver the created rows as after-images at v1")
    // every later commit attributes exactly like the from-v1 feed
    (2L to 4L).foreach { v =>
      val streamed = feed.filter(col(ver) === v).drop(ver)
      assert(net(streamed) == asImages(t.changesDelta(v - 1, v)),
        s"net images at v$v diverge from changesDelta")
    }
    // the public incremental API accepts the same since-the-beginning
    // span: changes(0, v) = the v-snapshot's rows as after-images
    assert(net(t.changesDelta(0, 1).withColumn(ver, lit(1L))) ==
      asImages(t.changesDelta(0, 1)))
    assert(t.changes(0, t.currentVersion.get).count() == t.read.count())
  }

  test("batch startingVersion=0 + initialSnapshot=collapse reads O(head)") {
    val (path, t) = history("cdccollapse")
    val head = t.currentVersion.get
    val feed = spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", 0)
      .option("initialSnapshot", "collapse").load(path)
    // the whole head snapshot as after-images, every row stamped head —
    // the vacuum-tolerant net-state read (streaming initial-offset
    // behavior), NOT a per-commit walk
    assert(feed.select(img).distinct().head().getString(0) == "after")
    assert(feed.select(ver).distinct().head().getLong(0) == head)
    assert(asImages(feed.drop(ver)).map(r => (r._1, r._2, r._3)) ==
      t.read.select("id", "val", "part").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
        .toSeq.sorted)
    // option validation: collapse without startingVersion=0 / bad value
    val e1 = intercept[IllegalArgumentException](spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", 1)
      .option("initialSnapshot", "collapse").load(path).collect())
    assert(e1.getMessage.contains("startingVersion=0"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", 0)
      .option("initialSnapshot", "bogus").load(path).collect())
    assert(e2.getMessage.contains("perCommit"), e2.getMessage)
    // explicit perCommit = the default per-commit walk
    val walk = spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", 0)
      .option("initialSnapshot", "perCommit").load(path)
    assert(walk.filter(col(ver) === 1L).count() == 4)
  }

  test("batch span: DV growth delivers ONLY the newly-hidden row (no pairs)") {
    val (path, _) = history("cdcdv")
    val feed = spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", 2).option("endingVersion", 3).load(path)
    // raw delivery, not just the net: one before-image, nothing else —
    // the file's bytes are unchanged, so pairs would be pure waste
    val rows = feed.select("id", img).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq(3 -> "before"), s"got $rows")
  }

  test("streaming: AvailableNow drains the history; restart adds nothing") {
    val (path, t) = history("cdcstream")
    val outDir = tmp("cdcout").stripSuffix("/table") + "/out"
    val ckpt = tmp("cdcckpt").stripSuffix("/table") + "/ckpt"
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true")
        .option("startingVersion", 1) // images from v2 on
        .load(path)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "stream did not drain")
    }
    drain()
    val streamed = spark.read.parquet(outDir)
    (2L to 4L).foreach { v =>
      assert(net(streamed.filter(col(ver) === v).drop(ver)) ==
        asImages(t.changesDelta(v - 1, v)), s"streamed v$v diverges")
    }
    drain() // a second run resumes at the checkpointed head: no new rows
    assert(spark.read.parquet(outDir).count() == streamed.count())
    // a new commit streams incrementally on the next run
    t.upsert(Seq((6, "f", "p1")).toDF("id", "val", "part")) // v5
    drain()
    val afterV5 = spark.read.parquet(outDir)
    assert(net(afterV5.filter(col(ver) === 5L).drop(ver)) ==
      asImages(t.changesDelta(4, 5)))
  }

  test("streaming default start: the whole snapshot delivers as after-images") {
    val (path, t) = history("cdcinit")
    val outDir = tmp("cdcout2").stripSuffix("/table") + "/out"
    val ckpt = tmp("cdcckpt2").stripSuffix("/table") + "/ckpt"
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").load(path)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    val got = spark.read.parquet(outDir)
    val head = t.currentVersion.get
    assert(got.filter(col(img) =!= "after" || col(ver) =!= head).isEmpty)
    // the DV'd row (id=3) is hidden in the initial snapshot too
    assert(got.select("id").collect().map(_.getInt(0)).sorted.toSeq ==
      Seq(2, 4, 5))
  }

  test("multi-column partitioning: partition values land in their own slots") {
    // partitionCols order (status, month) deliberately REVERSED from
    // the schema order (…, month, status): the reader appends
    // partition values in index order, and the declared schema must
    // agree or the INT month value decodes in the STRING status slot
    val path = tmp("cdcmulti")
    val t = SnapshotTable(spark, path, "id",
      partitionCols = Seq("status", "month"))
    t.create(Seq((1, 1, "A"), (2, 2, "B")).toDF("id", "month", "status"))
    t.upsert(Seq((3, 3, "C")).toDF("id", "month", "status"))      // v2
    val feed = spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", 1).load(path)
    assert(feed.columns.toSeq ==
      Seq("id", "status", "month", img, ver))
    val rows = feed.select("id", "month", "status", img)
      .collect().map(r =>
        (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3))).toSeq
    assert(rows == Seq((3, 3, "C", "after")), s"got $rows")
  }

  test("a span past the head fails as a bad argument, not as 'vacuumed'") {
    val (path, _) = history("cdcspan")
    val e = intercept[Exception](spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", 1).option("endingVersion", 99)
      .load(path).collect())
    assert(e.getMessage.contains("exceeds the table head"), e.getMessage)
    assert(!e.getMessage.contains("vacuumed"), e.getMessage)
  }

  test("column pruning reaches the inner parquet scan (key-only feed)") {
    val (path, t) = history("cdcprune")
    val feed = spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", 1).load(path)
      .select("id", img, ver)
    val scan = feed.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan
    }.getOrElse(fail("no BatchScanExec"))
    val read = scan.readSchema().fieldNames.toSet
    assert(read.contains("id") && !read.contains("val"),
      s"pruning missed: $read")
    // and the pruned read still nets correctly (raw delivery carries
    // canceling rewrite pairs by contract)
    val netted = feed.filter(col(ver) === 4L)
      .groupBy("id")
      .agg(sum(when(col(img) === "after", 1).otherwise(-1)).as("d"))
      .filter(col("d") =!= 0)
      .select("id").collect().map(_.getInt(0)).toSeq.sorted
    assert(netted == t.changesDelta(3, 4).select("id").collect()
      .map(_.getInt(0)).toSeq.sorted)
  }

  test("option validation: CDF rejects version pins and versionless batch") {
    val (path, _) = history("cdcopts")
    val e1 = intercept[Exception](spark.read.format("graft")
      .option("readChangeFeed", "true").option("versionAsOf", 1)
      .load(path).collect())
    assert(e1.getMessage.contains("readChangeFeed"), e1.getMessage)
    val e2 = intercept[Exception](spark.read.format("graft")
      .option("readChangeFeed", "true").load(path).collect())
    assert(e2.getMessage.contains("startingVersion"), e2.getMessage)
  }
}
