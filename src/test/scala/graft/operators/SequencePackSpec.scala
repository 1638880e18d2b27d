package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Sequence packing: the distributed two-level prefix sum must equal
  * the single-partition reference exactly, window ids must follow from
  * the offsets, and the plan must not contain a global-order window
  * over the data (the scale killer the operator exists to avoid). */
class SequencePackSpec extends SparkSpec {

  import spark.implicits._

  private def docs(n: Int) =
    spark.range(0, n).select(
      $"id".as("doc_id"),
      // varied, deterministic token counts incl. zeros and ctx-crossers
      (pmod($"id" * 37 + 11, lit(700))).as("n_tokens"))

  test("offsets equal the single-partition reference on every row") {
    val d = docs(5000)
    val got = SequencePack
      .packOffsets(d, "doc_id", "n_tokens", ctxLen = 512, numPartitions = 8)
      .orderBy("doc_id").collect()
    val ref = d.withColumn("start_offset",
        coalesce(sum("n_tokens").over(
          Window.orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .orderBy("doc_id").collect()
    assert(got.length == ref.length)
    got.zip(ref).foreach { case (g, r) =>
      assert(g.getLong(0) == r.getLong(0))
      assert(g.getAs[Long]("start_offset") == r.getAs[Long]("start_offset"),
        s"doc ${g.getLong(0)}: ${g.getAs[Long]("start_offset")} vs " +
          s"${r.getAs[Long]("start_offset")}")
    }
    // window ids follow from the offsets; spans are contiguous
    got.foreach { g =>
      val (off, n) = (g.getAs[Long]("start_offset"), g.getAs[Long]("n_tokens"))
      assert(g.getAs[Long]("first_seq") == off / 512)
      assert(g.getAs[Long]("last_seq") == (off + math.max(n, 1) - 1) / 512)
    }
    // the axis is gapless: each start is the previous start + tokens
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("start_offset") ==
          a.getAs[Long]("start_offset") + a.getAs[Long]("n_tokens"))
      case _ => ()
    }
  }

  test("one full-data exchange: range shuffle only, no per-row window, fold in mapPartitions") {
    val plan = SequencePack
      .packOffsets(docs(100), "doc_id", "n_tokens", 512, numPartitions = 8)
      .queryExecution.executedPlan.toString
    // the per-row running sum is a partition-local fold
    assert(plan.contains("MapPartitions"), s"no mapPartitions fold:\n$plan")
    // no Window touches per-document rows — the only window runs over
    // the O(partitions)-row offset table (__pid/__psum columns only)
    val windowLines = plan.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windowLines.forall(l => !l.contains("doc_id")),
      s"a window operates on per-document rows:\n$plan")
    // exactly one full-data shuffle: the range partitioning by doc_id.
    // Any hashpartitioning exchange may only carry the O(partitions)
    // aggregate rows (keyed by __pid), never doc rows.
    assert(plan.contains("rangepartitioning"),
      s"range shuffle missing:\n$plan")
    val hashEx = plan.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.forall(_.contains("__pid")),
      s"unexpected full-data hash exchange:\n$plan")
  }

  test("ctxLen boundary cases: exact fits, stragglers, zero-token docs") {
    val d = Seq((1L, 512L), (2L, 0L), (3L, 1L), (4L, 1023L), (5L, 1L))
      .toDF("doc_id", "n_tokens")
    val got = SequencePack.packOffsets(d, "doc_id", "n_tokens", 512)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("start_offset"),
        r.getAs[Long]("first_seq"), r.getAs[Long]("last_seq")))
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 0L),       // fills window 0 exactly
      (2L, 512L, 1L, 1L),     // zero tokens pin to the window at 512
      (3L, 512L, 1L, 1L),
      (4L, 513L, 1L, 2L),     // straddles windows 1..2
      (5L, 1536L, 3L, 3L)))
  }
}
