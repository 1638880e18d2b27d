package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextAnalysis

/** The fused winnowing expression must be BIT-IDENTICAL to the
  * composable reference pipeline
  * (`winnowFingerprints(charGramHashesOfNorm(norm, k), w)` — which is
  * already sorted+distinct) on real corpus text and on every
  * degenerate shape (empty, shorter than a gram, fewer grams than a
  * window, multi-byte/CJK text where codepoint-window slicing matters).
  * Any drift silently changes which documents share fingerprints. */
class WinnowFingerprintsSpec extends SparkSpec {

  import spark.implicits._

  private def bothForms(df: org.apache.spark.sql.DataFrame, k: Int, w: Int) =
    df.withColumn("__norm", TextAnalysis.normalize($"text"))
      .withColumn("__grams", TextAnalysis.charGramHashesOfNorm($"__norm", k))
      .select(
        TextAnalysis.winnowFingerprintsFusedOfNorm($"__norm", k, w).as("f"),
        TextAnalysis.winnowFingerprints($"__grams", w).as("ref"))

  test("fused fingerprints match the composable form on the real corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    for ((k, w) <- Seq((8, 4), (5, 3), (3, 1))) {
      val rows = bothForms(docs, k, w).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"(k=$k,w=$w): fused ${r.getSeq[String](0).take(3)}... vs " +
            s"ref ${r.getSeq[String](1).take(3)}...")
      }
    }
  }

  test("degenerate and multi-byte shapes match") {
    val texts = Seq(
      "",                            // empty: one md5("") gram
      "ab",                          // shorter than k
      "abcdefgh",                    // exactly one gram
      "abcdefghij",                  // grams < window
      "aaaaaaaaaaaaaaaaaaaa",        // all-equal grams (tie handling)
      "  Mixed   CASE   text with runs  ",
      "汉字文本混合ascii and ideographs 漢字",  // multi-byte codepoints
      "τδφ ünïcödé ascii mix 0123456789",
      "x" * 500                      // long single-char run
    ).toDF("text")
    val rows = bothForms(texts, 8, 4).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("declared schema matches the composable form") {
    val docs = Seq("some document text here").toDF("text")
    val both = bothForms(docs, 8, 4)
    assert(both.schema("f").dataType == both.schema("ref").dataType,
      s"${both.schema("f").dataType} vs ${both.schema("ref").dataType}")
  }
}
