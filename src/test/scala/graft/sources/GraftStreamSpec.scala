package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.plans.SnapshotTable

/** `spark.readStream.format("graft")` — the snapshot table as a
  * streaming source: manifest versions are offsets, each micro-batch
  * reads exactly the files its commits added, and a checkpoint resumes
  * where the last run stopped. */
class GraftStreamSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_$tag").toString

  test("availableNow catch-up delivers the whole table, checkpoint resumes with only new commits") {
    val root = tmp("stream_src")
    val path = s"$root/table"
    val ckpt = s"$root/ckpt"
    val t = SnapshotTable(spark, path, "id")
    t.create(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    t.append(Seq((3, "c")).toDF("id", "v")) // v2: blind append

    val out = s"$root/out"
    def drain(): Unit = {
      val q = spark.readStream.format("graft").load(path)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    def sunk(): Seq[(Int, String)] =
      spark.read.parquet(out).orderBy("id").collect()
        .map(r => (r.getInt(0), r.getString(1))).toSeq

    drain()
    assert(sunk() == Seq((1, "a"), (2, "b"), (3, "c")))

    // two more commits while the stream is down; the same checkpoint
    // must deliver ONLY them on restart (sink accumulates 1..5, no
    // re-delivery of 1..3)
    t.append(Seq((4, "d")).toDF("id", "v")) // v3
    t.append(Seq((5, "e")).toDF("id", "v")) // v4
    drain()
    assert(sunk() ==
      Seq((1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")))
  }

  test("a stream spanning widening and DEFAULT-add commits delivers " +
      "every vintage under the head schema") {
    import org.apache.spark.sql.types.{LongType, StringType}
    val root = tmp("stream_widen")
    val path = s"$root/table"
    val t = SnapshotTable(spark, path, "id")
    t.create(Seq((1L, 10), (2L, 20)).toDF("id", "q")) // v1: int-typed q
    t.widenColumn("q", LongType)                    // v2: metadata-only
    t.addColumn("tag", StringType, Some("'old'"))   // v3: metadata-only
    t.append(Seq((3L, 1L << 40, "new")).toDF("id", "q", "tag")) // v4: wide
    val out = s"$root/out"
    val q = spark.readStream.format("graft").load(path)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // the narrow-vintage commits replay promoted (int bytes as long)
    // and default-filled (file-missing column reads the frozen 'old')
    val rows = spark.read.parquet(out).orderBy("id").collect()
      .map(r => (r.getLong(r.fieldIndex("id")), r.getLong(r.fieldIndex("q")),
        r.getString(r.fieldIndex("tag")))).toSeq
    assert(rows == Seq((1L, 10L, "old"), (2L, 20L, "old"),
      (3L, 1L << 40, "new")), rows.toString)
  }

  test("projection and filter apply to the streamed batches") {
    val root = tmp("stream_proj")
    val path = s"$root/table"
    val t = SnapshotTable(spark, path, "id")
    t.create(Seq((1, "keep", 10), (2, "drop", 20), (3, "keep", 30))
      .toDF("id", "tag", "x"))
    val q = spark.readStream.format("graft").load(path)
      .filter($"tag" === "keep").select($"id", $"x")
      .writeStream.format("memory").queryName("graft_stream_proj")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.table("graft_stream_proj").orderBy("id").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((1, 10), (3, 30)))
  }

  test("startingTimestamp skips history committed before the instant") {
    val root = tmp("stream_ts")
    val path = s"$root/table"
    val t = SnapshotTable(spark, path, "id")
    t.create(Seq((1, "old")).toDF("id", "v"))
    // manifest mtimes ARE the commit times: put a real gap between the
    // historical commit and the cut so the boundary is unambiguous
    Thread.sleep(50)
    val cut = System.currentTimeMillis()
    Thread.sleep(50)
    t.append(Seq((2, "new")).toDF("id", "v"))

    val out = s"$root/out"
    val q = spark.readStream.format("graft")
      .option("startingTimestamp", cut.toString).load(path)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.read.parquet(out).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((2, "new")))

    // an instant predating the table delivers everything
    val out2 = s"$root/out2"
    val q2 = spark.readStream.format("graft")
      .option("startingTimestamp", "2000-01-01").load(path)
      .writeStream.format("parquet").option("path", out2)
      .option("checkpointLocation", s"$root/ckpt2")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(60000)
    assert(spark.read.parquet(out2).count() == 2)

    // both range options at once is a configuration error
    intercept[Exception] {
      val q3 = spark.readStream.format("graft")
        .option("startingTimestamp", cut.toString)
        .option("startingVersion", "1").load(path)
        .writeStream.format("parquet").option("path", s"$root/out3")
        .option("checkpointLocation", s"$root/ckpt3")
        .trigger(Trigger.AvailableNow()).start()
      q3.awaitTermination()
    }
  }

  test("startingVersion=latest tails only post-start commits") {
    val root = tmp("stream_tail")
    val path = s"$root/table"
    val ckpt = s"$root/ckpt"
    val t = SnapshotTable(spark, path, "id")
    t.create(Seq((1, "history")).toDF("id", "v"))
    val out = s"$root/out"
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("startingVersion", "latest").load(path)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    // run 1 pins the initial offset at the current head: nothing emitted
    drain()
    assert(spark.read.parquet(out).isEmpty)
    t.append(Seq((2, "new")).toDF("id", "v"))
    drain() // checkpointed offset wins over startingVersion now
    assert(spark.read.parquet(out).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((2, "new")))
  }

  test("a row image added and rewritten away between triggers is still delivered") {
    val root = tmp("stream_shortlived")
    val path = s"$root/table"
    val ckpt = s"$root/ckpt"
    val out = s"$root/out"
    val t = SnapshotTable(spark, path, "id")
    t.create(Seq((1, "a")).toDF("id", "v")) // v1
    def drain(): Unit = {
      val q = spark.readStream.format("graft").load(path)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    drain() // checkpoint at v1
    // while the stream is down: a row lives at v2 and is deleted at v3.
    // A net v1→v3 set-diff never sees its file; the per-commit walk
    // delivers it — at-least-once per row image, as documented.
    t.append(Seq((2, "short")).toDF("id", "v")) // v2
    t.delete($"id" === 2)                       // v3
    drain()
    assert(spark.read.parquet(out).orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "short")))
  }

  test("a vacuumed start offset fails the stream with an explicit message") {
    val root = tmp("stream_vacuumed")
    val path = s"$root/table"
    val ckpt = s"$root/ckpt"
    val out = s"$root/out"
    val t = SnapshotTable(spark, path, "id")
    t.create(Seq((1, "a")).toDF("id", "v")) // v1
    def drain(): Unit = {
      val q = spark.readStream.format("graft").load(path)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    drain() // checkpoint at v1
    t.append(Seq((2, "b")).toDF("id", "v")) // v2
    t.append(Seq((3, "c")).toDF("id", "v")) // v3
    t.append(Seq((4, "d")).toDF("id", "v")) // v4
    t.vacuum(keepVersions = 2, retentionMs = 0L) // v1's manifest is gone
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("no longer retained")))
  }

  test("a partitioned upsert table streams its rewritten partitions") {
    val root = tmp("stream_part")
    val path = s"$root/table"
    val t = SnapshotTable(spark, path, "id", Some("part"))
    t.create(Seq((1, "a", "p1"), (2, "b", "p2")).toDF("id", "v", "part"))
    val q = spark.readStream.format("graft").load(path)
      .writeStream.format("memory").queryName("graft_stream_part")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.table("graft_stream_part").orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((1, "a", "p1"), (2, "b", "p2")))
  }
}
