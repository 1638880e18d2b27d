package graft.operators

import graft.SparkSpec

/** Contamination semantics on a hand-built fixture: one shared n-token
  * window marks a document; n−1 shared tokens do not; normalization
  * differences (case, whitespace) don't hide overlap. */
class DecontaminateSpec extends SparkSpec {

  import spark.implicits._

  private val benchText = "alpha beta gamma delta epsilon zeta eta theta"

  test("one shared 8-token window contaminates; 7 tokens don't; normalization applies") {
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val corpus = Seq(
      // full 8-token window lifted verbatim, surrounded by noise
      (1L, s"intro words $benchText trailing tail"),
      // same window but UPPERCASED + doubled spaces: normalization
      // must still catch it
      (2L, "x  ALPHA BETA  GAMMA DELTA EPSILON ZETA ETA THETA  y"),
      // only 7 consecutive tokens shared -> clean
      (3L, "alpha beta gamma delta epsilon zeta eta iota filler filler2"),
      // nothing shared -> clean
      (4L, "completely unrelated text with enough tokens to shingle fine")
    ).toDF("doc_id", "text")
    val bad = Decontaminate
      .contaminatedIds(corpus, bench, "doc_id", "text", n = 8)
      .as[Long].collect().toSet
    assert(bad == Set(1L, 2L), bad.toString)
    val kept = Decontaminate.clean(corpus, bench, "doc_id", "text", n = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L))
  }

  test("short documents compare as whole-document shingles") {
    val bench = Seq((100L, "tiny doc")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "tiny doc"),        // identical short doc -> contaminated
      (2L, "tiny doc extra")   // different whole-doc shingle -> clean
    ).toDF("doc_id", "text")
    val bad = Decontaminate
      .contaminatedIds(corpus, bench, "doc_id", "text", n = 8)
      .as[Long].collect().toSet
    assert(bad == Set(1L))
  }
}
