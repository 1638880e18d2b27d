package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-loop scale smoke (not part of the gate): runs the newest
  * operators at ~10,000× the sf0.1 row counts on local[32] to back
  * their scale designs with measurements rather than claims.
  * `sbt 'Test/runMain graft.StressMain'` */
object StressMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "32g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[stress] $tag ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }

    // --- SequencePack: 50M docs (10,000x the sf0.1 documents table) ---
    val docs = spark.range(0, 50_000_000L)
      .select($"id".as("doc_id"),
        pmod($"id" * 37 + 11, lit(700)).as("n_tokens"))
    val packed = operators.SequencePack
      .packOffsets(docs, "doc_id", "n_tokens", ctxLen = 2048)
    val tail = timed("sequence_pack 50M rows") {
      packed.agg(
        max($"start_offset" + $"n_tokens").as("total_tokens"),
        count(lit(1)).as("n_docs")).head()
    }
    val expectedTotal = docs.agg(sum("n_tokens")).head().getLong(0)
    assert(tail.getLong(1) == 50_000_000L, s"row loss: ${tail.getLong(1)}")
    assert(tail.getLong(0) == expectedTotal,
      s"axis length ${tail.getLong(0)} != token sum $expectedTotal")
    println(s"[stress] sequence_pack OK: ${tail.getLong(1)} docs, " +
      s"${tail.getLong(0)} tokens on the axis")

    // --- Components: 1.5M edges forming 500k chains of 4 nodes
    //     (diameter 3 — deeper than near-dup cliques, so the round
    //     count is exercised, not just the happy path) ---
    val edges = spark.range(0, 1_500_000L).select(
      expr("(id div 3) * 4 + id % 3").as("a"),
      expr("(id div 3) * 4 + id % 3 + 1").as("b"))
    val comps = timed("components 1.5M chain edges") {
      val c = operators.Components.minLabelComponents(edges, "a", "b")
      c.agg(countDistinct("label").as("n_components"),
        count(lit(1)).as("n_nodes")).head()
    }
    assert(comps.getLong(0) == 500_000L,
      s"expected 500k components, got ${comps.getLong(0)}")
    println(s"[stress] components OK: ${comps.getLong(1)} nodes in " +
      s"${comps.getLong(0)} components")

    spark.stop()
  }
}
