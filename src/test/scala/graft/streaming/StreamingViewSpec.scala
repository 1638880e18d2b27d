package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.{MaterializedAgg, SnapshotTable}

/** Continuously-maintained materialized aggregate: snapshot collapse on
  * first start, incremental catch-up from the CDC stream, and the
  * watermark fence against replays. */
class StreamingViewSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_$tag").toString

  private def rows(t: (Int, Int, String)*) =
    t.toDF("id", "amount", "grp")

  private val sums = Seq("total" -> col("amount").cast("long"))

  private def state(v: SnapshotTable): Map[String, (Long, Long)] =
    v.read.collect().map(r => r.getAs[String]("grp") ->
      (r.getAs[Long]("total"), r.getAs[Long](MaterializedAgg.CountCol)))
      .toMap

  private def expected(src: SnapshotTable): Map[String, (Long, Long)] =
    src.read.groupBy("grp")
      .agg(sum("amount").as("t"), count(lit(1)).as("c"))
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Long]("t"), r.getAs[Long]("c"))).toMap

  test("stream-maintained view: collapse, incremental catch-up, replay fence") {
    val base = tmp("svmaint")
    val src = SnapshotTable(spark, s"$base/src", "id", Some("grp"))
    val view = SnapshotTable(spark, s"$base/view", MaterializedAgg.KeyCol,
      statsCols = Seq(MaterializedAgg.KeyCol),
      clusterBy = Seq(MaterializedAgg.KeyCol), clusterFiles = 4)
    src.create(rows((1, 10, "a"), (2, 20, "a"), (3, 5, "b")))
    // first start: the stream's initial offset collapses to the head
    // snapshot — one batch of after-images creates the view
    StreamingView.maintainAdditive(spark, s"$base/src", view,
      Seq("grp"), sums, s"$base/ckpt")
    assert(state(view) == expected(src))
    assert(view.properties(MaterializedAgg.SourceVersionProp) ==
      src.currentVersion.get.toString)

    // three more commits: update+insert, a group-emptying delete, and
    // a compaction (whose uncanceled pairs must fold to zero)
    src.upsert(rows((2, 25, "a"), (4, 7, "c")))
    src.delete(col("grp") === "b")
    src.compact(minFiles = 2)
    // SAME checkpoint: resumes from the absorbed offset, incremental
    StreamingView.maintainAdditive(spark, s"$base/src", view,
      Seq("grp"), sums, s"$base/ckpt")
    assert(state(view) == expected(src))
    assert(!state(view).contains("b"), "emptied group must leave the view")
    assert(view.properties(MaterializedAgg.SourceVersionProp) ==
      src.currentVersion.get.toString)

    // replay fence: a FRESH checkpoint re-delivers the whole head as a
    // collapsed snapshot — every image is at-or-below the watermark,
    // so nothing double-folds and the view is untouched
    val vBefore = view.currentVersion
    StreamingView.maintainAdditive(spark, s"$base/src", view,
      Seq("grp"), sums, s"$base/ckpt2")
    assert(state(view) == expected(src))
    assert(view.currentVersion == vBefore,
      "fully-absorbed replay must not commit")
  }

  test("fresh checkpoint with a LAGGING watermark resumes per-commit, never doubles") {
    val base = tmp("svlag")
    val src = SnapshotTable(spark, s"$base/src", "id", Some("grp"))
    val view = SnapshotTable(spark, s"$base/view", MaterializedAgg.KeyCol,
      statsCols = Seq(MaterializedAgg.KeyCol),
      clusterBy = Seq(MaterializedAgg.KeyCol), clusterFiles = 4)
    src.create(rows((1, 10, "a"), (2, 20, "b")))
    StreamingView.maintainAdditive(spark, s"$base/src", view,
      Seq("grp"), sums, s"$base/ckpt")
    // source advances past the view's watermark; the checkpoint is
    // LOST. The naive restart would collapse span (0, head] into one
    // snapshot stamped head — all above the watermark — and fold the
    // already-absorbed state a second time (every total doubled).
    src.upsert(rows((3, 5, "a")))
    StreamingView.maintainAdditive(spark, s"$base/src", view,
      Seq("grp"), sums, s"$base/ckpt_rebuilt")
    assert(state(view) == expected(src),
      s"lagging-watermark restart corrupted the view: ${state(view)}")
    assert(view.properties(MaterializedAgg.SourceVersionProp) ==
      src.currentVersion.get.toString)
  }

  test("maintainByDefinition: additive AND recompute views track the source") {
    // additive: SQL-declarable definition, maintained from the stream
    val baseA = tmp("svdefadd")
    val srcA = SnapshotTable(spark, s"$baseA/src", "id", Some("grp"))
    val viewA = SnapshotTable(spark, s"$baseA/view", MaterializedAgg.KeyCol,
      statsCols = Seq(MaterializedAgg.KeyCol),
      clusterBy = Seq(MaterializedAgg.KeyCol), clusterFiles = 4)
    srcA.create(rows((1, 10, "a"), (2, 20, "b")))
    MaterializedAgg.defineAdditive(srcA, viewA, Seq("grp"),
      Seq("total" -> "CAST(amount AS BIGINT)"))
    srcA.upsert(rows((3, 5, "a")))
    srcA.delete(col("grp") === "b")
    StreamingView.maintainByDefinition(viewA, s"$baseA/ckpt")
    assert(state(viewA) == expected(srcA))

    // recompute: min/max stay exact under a streamed delete — the
    // dirty groups recompute from the source pinned at the batch's
    // high-water version
    val baseR = tmp("svdefrec")
    val srcR = SnapshotTable(spark, s"$baseR/src", "id", Some("grp"))
    val viewR = SnapshotTable(spark, s"$baseR/view", MaterializedAgg.KeyCol,
      statsCols = Seq(MaterializedAgg.KeyCol),
      clusterBy = Seq(MaterializedAgg.KeyCol), clusterFiles = 4)
    srcR.create(rows((1, 10, "a"), (2, 20, "a"), (3, 5, "b")))
    MaterializedAgg.defineRecompute(srcR, viewR, Seq("grp"),
      Seq("hi" -> "max(amount)"))
    srcR.delete(col("id") === 2)   // a's max must drop 20 -> 10
    srcR.delete(col("grp") === "b") // b vanishes
    StreamingView.maintainByDefinition(viewR, s"$baseR/ckpt")
    val st = viewR.read.collect()
      .map(r => r.getAs[String]("grp") -> r.getAs[Int]("hi")).toMap
    assert(st == Map("a" -> 10))
    assert(viewR.properties(MaterializedAgg.SourceVersionProp) ==
      srcR.currentVersion.get.toString)
    // idempotent catch-up: nothing new, nothing committed
    val v0 = viewR.currentVersion
    StreamingView.maintainByDefinition(viewR, s"$baseR/ckpt")
    assert(viewR.currentVersion == v0)
    // compaction-only source churn: the raw pair feed re-delivers
    // every rewritten row, but the NET-fold cancels the pairs — no
    // group recomputes, no view file rewrites; only the watermark
    // advances past the compaction commit
    srcR.append(rows((9, 1, "a"), (10, 2, "a"))) // fragment first
    StreamingView.maintainByDefinition(viewR, s"$baseR/ckpt")
    val filesBefore = viewR.candidateFiles().map(_.path).toSet
    srcR.compact(minFiles = 2)
    StreamingView.maintainByDefinition(viewR, s"$baseR/ckpt")
    assert(viewR.candidateFiles().map(_.path).toSet == filesBefore,
      "compaction-only churn rewrote view files")
    assert(viewR.properties(MaterializedAgg.SourceVersionProp) ==
      srcR.currentVersion.get.toString)
    val stC = viewR.read.collect()
      .map(r => r.getAs[String]("grp") -> r.getAs[Int]("hi")).toMap
    assert(stC == Map("a" -> 10))
  }

  test("an existing view without the watermark property fails loudly") {
    import spark.implicits._
    val base = tmp("svbad")
    val src = SnapshotTable(spark, s"$base/src", "id", Some("grp"))
    src.create(rows((1, 1, "a")))
    val view = SnapshotTable(spark, s"$base/view", MaterializedAgg.KeyCol)
    view.create(Seq(("k", "a", 1L, 1L))
      .toDF(MaterializedAgg.KeyCol, "grp", "total", MaterializedAgg.CountCol))
    val e = intercept[IllegalStateException] {
      StreamingView.maintainAdditive(spark, s"$base/src", view,
        Seq("grp"), sums, s"$base/ckpt")
    }
    assert(e.getMessage.contains("not a maintained view"))
  }
}
