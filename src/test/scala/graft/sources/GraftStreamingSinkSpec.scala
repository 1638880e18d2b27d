package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.SparkSpec
import graft.plans.SnapshotTable

/** `df.writeStream.format("graft")` — the snapshot table as a native
  * streaming SINK: each epoch is one atomic manifest commit carrying
  * the epoch high-water mark, so replayed micro-batches are dropped
  * (exactly-once), partition routing matches the batch writers, CHECK
  * constraints bind, and Complete mode replaces the table per epoch. */
class GraftStreamingSinkSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_$tag").toString

  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    q.awaitTermination(120000)

  test("appended epochs equal the streamed input, partition-routed") {
    val root = tmp("sink_append")
    val src = SnapshotTable(spark, s"$root/src", "id")
    src.create(Seq((1, "a", "x"), (2, "b", "y")).toDF("id", "v", "p"))
    src.append(Seq((3, "c", "x")).toDF("id", "v", "p"))

    val dst = SnapshotTable(spark, s"$root/dst", "id",
      partitionCol = Some("p"))
    dst.createEmpty(src.read.schema)

    drain(spark.readStream.format("graft").load(s"$root/src")
      .writeStream.format("graft").option("path", s"$root/dst")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start())

    val fresh = SnapshotTable(spark, s"$root/dst", "id")
    assert(fresh.read.orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((1, "a", "x"), (2, "b", "y"), (3, "c", "x")))
    // files live under Hive-style partition dirs, prunable like any
    // batch-written snapshot
    val parts = fresh.candidateFilesEq()
      .map(f => SnapshotTable.partOf(f.path)).toSet
    assert(parts == Set("x", "y"))
    assert(fresh.candidateFilesEq().forall(_.path.startsWith("p=")))
    assert(fresh.readWhereEq(("p", "x")).count() == 2)
  }

  test("a replayed micro-batch commits nothing: epoch mark makes the sink exactly-once") {
    val root = tmp("sink_replay")
    val src = SnapshotTable(spark, s"$root/src", "id")
    src.create(Seq((1, 10L), (2, 20L)).toDF("id", "amt"))

    val dst = SnapshotTable(spark, s"$root/dst", "id")
    dst.createEmpty(src.read.schema)

    def run(): Unit =
      drain(spark.readStream.format("graft").load(s"$root/src")
        .writeStream.format("graft").option("path", s"$root/dst")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start())

    run()
    val after = SnapshotTable(spark, s"$root/dst", "id")
    val v1 = after.currentVersion.get
    assert(after.read.count() == 2)

    // simulate the crash window: the sink commit landed but the
    // checkpoint's commit-log record didn't — delete the newest
    // commit-log entry and restart; Spark re-runs the epoch and the
    // sink must detect the already-committed mark and drop it
    val commits = new java.io.File(s"$root/ckpt/commits")
    val newest = commits.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toLong)
    assert(newest.delete())
    // the checksummed local FS would otherwise refuse to re-create the
    // commit record over its orphaned .crc sibling
    new java.io.File(commits, s".${newest.getName}.crc").delete()
    run()

    val replayed = SnapshotTable(spark, s"$root/dst", "id")
    assert(replayed.read.count() == 2, "replay must not duplicate rows")
    assert(replayed.currentVersion.get == v1,
      "replay must not advance the table version")
  }

  test("complete mode replaces the table each epoch: final state equals the batch aggregate") {
    val root = tmp("sink_complete")
    val src = SnapshotTable(spark, s"$root/src", "id")
    src.create(Seq((1, "x"), (2, "y"), (3, "x")).toDF("id", "p"))
    src.append(Seq((4, "x"), (5, "z")).toDF("id", "p"))

    val agg = SnapshotTable(spark, s"$root/agg", "p")
    agg.createEmpty(
      src.read.groupBy("p").count().schema)

    drain(spark.readStream.format("graft").load(s"$root/src")
      .groupBy("p").count()
      .writeStream.format("graft").option("path", s"$root/agg")
      .outputMode("complete")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start())

    val got = SnapshotTable(spark, s"$root/agg", "p").read
      .orderBy("p").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("x", 3L), ("y", 1L), ("z", 1L)))
  }

  test("logged CHECK constraints bind the streaming sink") {
    val root = tmp("sink_check")
    val src = SnapshotTable(spark, s"$root/src", "id")
    src.create(Seq((1, 5L), (2, -1L)).toDF("id", "amt"))

    val dst = SnapshotTable(spark, s"$root/dst", "id",
      checkConstraints = Seq(("amt_nonneg", col("amt") >= 0)))
    dst.createEmpty(src.read.schema)

    val e = intercept[StreamingQueryException] {
      val q = spark.readStream.format("graft").load(s"$root/src")
        .writeStream.format("graft").option("path", s"$root/dst")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("amt_nonneg"))))
    // nothing may have committed past the empty v1
    assert(SnapshotTable(spark, s"$root/dst", "id").read.count() == 0)
  }

  test("a name/type mismatch against the table schema fails the query, not the data") {
    val root = tmp("sink_schema")
    val src = SnapshotTable(spark, s"$root/src", "id")
    src.create(Seq((1, "a")).toDF("id", "v"))

    val dst = SnapshotTable(spark, s"$root/dst", "id")
    dst.createEmpty(Seq((1, 2L)).toDF("id", "other").schema)

    val e = intercept[Exception] {
      val q = spark.readStream.format("graft").load(s"$root/src")
        .writeStream.format("graft").option("path", s"$root/dst")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => Option(c.getMessage)
      .exists(_.contains("streaming write schema mismatch"))))
  }

  test("a stream omitting the partition column fails at the DRIVER, not per task") {
    val root = tmp("sink_nopc")
    val src = SnapshotTable(spark, s"$root/src", "id")
    src.create(Seq((1, "a")).toDF("id", "v"))
    val dst = SnapshotTable(spark, s"$root/dst", "id", Some("part"))
    dst.createEmpty(Seq((1, "a", "p1")).toDF("id", "v", "part").schema)
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft").load(s"$root/src")
        .writeStream.format("graft").option("path", s"$root/dst")
        .option("mergeSchema", "true") // shared-name check alone passes
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => Option(c.getMessage)
      .exists(_.contains("omits partition column"))),
      s"expected the driver-side partition-column error, got: $e")
  }

  test("mergeKey mode: each epoch upserts; later epochs overwrite earlier rows by key") {
    val root = tmp("sink_merge")
    val src = SnapshotTable(spark, s"$root/src", "id")
    // v1: initial keys; v2: updates one key, adds one; v3: updates again
    src.create(Seq((1, "a1"), (2, "b1")).toDF("id", "v"))
    src.append(Seq((2, "b2"), (3, "c1")).toDF("id", "v"))
    src.append(Seq((1, "a3")).toDF("id", "v"))

    val dst = SnapshotTable(spark, s"$root/dst", "id")
    dst.createEmpty(src.read.schema)

    def run(): Unit =
      drain(spark.readStream.format("graft")
        .option("maxVersionsPerTrigger", "1").load(s"$root/src")
        .writeStream.format("graft").option("path", s"$root/dst")
        .option("mergeKey", "id")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start())
    run()

    def state(): Seq[(Int, String)] =
      SnapshotTable(spark, s"$root/dst", "id").read.orderBy("id")
        .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    // one epoch per source version: merges apply in commit order
    assert(state() == Seq((1, "a3"), (2, "b2"), (3, "c1")))

    // replay of the last epoch (commit-log record deleted) merges
    // nothing twice and bumps no version
    val v = SnapshotTable(spark, s"$root/dst", "id").currentVersion.get
    val commits = new java.io.File(s"$root/ckpt/commits")
    val newest = commits.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toLong)
    assert(newest.delete())
    new java.io.File(commits, s".${newest.getName}.crc").delete()
    run()
    assert(state() == Seq((1, "a3"), (2, "b2"), (3, "c1")))
    assert(SnapshotTable(spark, s"$root/dst", "id").currentVersion.get == v)
  }

  test("mergeKey mode routes through partitioned upserts: untouched partitions carry over") {
    val root = tmp("sink_merge_part")
    val src = SnapshotTable(spark, s"$root/src", "id")
    src.create(Seq((1, "x", "old1"), (2, "y", "old2")).toDF("id", "p", "v"))
    src.append(Seq((1, "x", "new1")).toDF("id", "p", "v")) // touches only p=x

    val dst = SnapshotTable(spark, s"$root/dst", "id",
      partitionCol = Some("p"))
    dst.createEmpty(src.read.schema)

    drain(spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1").load(s"$root/src")
      .writeStream.format("graft").option("path", s"$root/dst")
      .option("mergeKey", "id")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start())

    val dst2 = SnapshotTable(spark, s"$root/dst", "id")
    assert(dst2.read.orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((1, "x", "new1"), (2, "y", "old2")))
    // the second epoch rewrote only p=x: p=y's file carries the
    // first epoch's commit id prefix
    val parts = dst2.candidateFilesEq().groupBy(f =>
      SnapshotTable.partOf(f.path))
    assert(parts("y").size == 1)
  }

  test("mergeSchema evolves the table for a stream carrying new columns; old rows read null") {
    val root = tmp("sink_evolve")
    val src = SnapshotTable(spark, s"$root/src", "id")
    src.create(Seq((10, "n1", "extra1")).toDF("id", "v", "extra"))

    // the sink table predates the 'extra' column and has a row
    val dst = SnapshotTable(spark, s"$root/dst", "id")
    dst.create(Seq((1, "old")).toDF("id", "v"))

    // without mergeSchema the wider stream is rejected
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft").load(s"$root/src")
        .writeStream.format("graft").option("path", s"$root/dst")
        .option("checkpointLocation", s"$root/ckptA")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => Option(c.getMessage)
      .exists(_.contains("streaming write schema mismatch"))))

    drain(spark.readStream.format("graft").load(s"$root/src")
      .writeStream.format("graft").option("path", s"$root/dst")
      .option("mergeSchema", "true")
      .option("checkpointLocation", s"$root/ckptB")
      .trigger(Trigger.AvailableNow()).start())

    val got = SnapshotTable(spark, s"$root/dst", "id").read
      .orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1), Option(r.getString(2))))
      .toSeq
    assert(got == Seq((1, "old", None), (10, "n1", Some("extra1"))))

    // merge mode evolves too: an update arrives with the new column
    val src2 = SnapshotTable(spark, s"$root/src2", "id")
    src2.create(Seq((1, "updated", "extra2")).toDF("id", "v", "extra2"))
    drain(spark.readStream.format("graft").load(s"$root/src2")
      .writeStream.format("graft").option("path", s"$root/dst")
      .option("mergeSchema", "true").option("mergeKey", "id")
      .option("checkpointLocation", s"$root/ckptC")
      .trigger(Trigger.AvailableNow()).start())
    val cols = SnapshotTable(spark, s"$root/dst", "id").read.columns.toSet
    assert(cols == Set("id", "v", "extra", "extra2"))
    val merged = SnapshotTable(spark, s"$root/dst", "id").read
      .orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(merged == Seq((1, "updated"), (10, "n1")))
  }

  test("autoCompact bin-packs the accreted epoch files behind the stream") {
    val root = tmp("sink_autocompact")
    val src = SnapshotTable(spark, s"$root/src", "id")
    // five commits → five epochs → five small files without compaction
    src.create(Seq((1, "a")).toDF("id", "v"))
    (2 to 5).foreach(i => src.append(Seq((i, s"v$i")).toDF("id", "v")))

    val dst = SnapshotTable(spark, s"$root/dst", "id")
    dst.createEmpty(src.read.schema)

    drain(spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1").load(s"$root/src")
      .writeStream.format("graft").option("path", s"$root/dst")
      .option("autoCompact", "3")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start())

    val after = SnapshotTable(spark, s"$root/dst", "id")
    assert(after.read.count() == 5)
    assert(after.candidateFiles().size < 5,
      s"expected compaction to pack the per-epoch files, " +
        s"got ${after.candidateFiles().size}")
  }

  test("micro-batches cluster by the partition column: no per-epoch small-file explosion") {
    val root = tmp("sink_files")
    val n = 1000
    val src = SnapshotTable(spark, s"$root/src", "id")
    src.create(spark.range(n).repartition(8)
      .select(col("id"), (col("id") % 10).cast("string").as("p")))

    val dst = SnapshotTable(spark, s"$root/dst", "id",
      partitionCol = Some("p"))
    dst.createEmpty(src.read.schema)

    drain(spark.readStream.format("graft").load(s"$root/src")
      .writeStream.format("graft").option("path", s"$root/dst")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start())

    val fresh = SnapshotTable(spark, s"$root/dst", "id")
    assert(fresh.read.count() == n)
    val files = fresh.candidateFilesEq()
    // clustered + sorted by p: each of the 10 partition values lands in
    // ONE task's writer → ≤10 files; without the declared distribution
    // the 8 source splits would each write every dir (~80)
    assert(files.size <= 10,
      s"expected ≤10 clustered files, got ${files.size}")
  }
}
