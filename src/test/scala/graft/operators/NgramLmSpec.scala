package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bigram-LM perplexity: hand-computed smoothing arithmetic, unseen
  * token/bigram fallbacks, and the short-document contract. */
class NgramLmSpec extends SparkSpec {

  import spark.implicits._

  test("selfPerplexity reproduces hand-computed add-one bigram NLL") {
    // corpus: "a b a b" and "a b c". Bigrams: (a,b)x3, (b,a)x1, (b,c)x1.
    // histories: c(a.)=3, c(b.)=2. V = 3 (a, b, c).
    // doc 1 bigrams: ab, ba, ab -> nll = [ln((3+3)/(3+1)), ln((2+3)/(1+1)),
    //   ln(6/4)] = [ln 1.5, ln 2.5, ln 1.5]
    // doc 2: ab, bc -> [ln(6/4), ln((2+3)/(1+1))] = [ln 1.5, ln 2.5]
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = NgramLm.selfPerplexity(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val d1 = (math.log(1.5) + math.log(2.5) + math.log(1.5)) / 3
    val d2 = (math.log(1.5) + math.log(2.5)) / 2
    assert(got(1L)._1 == 3L && got(2L)._1 == 2L)
    assert(math.abs(got(1L)._2 - d1) < 1e-12, s"doc1 nll ${got(1L)._2} != $d1")
    assert(math.abs(got(2L)._2 - d2) < 1e-12)
    assert(math.abs(got(1L)._3 - math.exp(d1)) < 1e-12)
  }

  test("scoring a disjoint corpus smooths unseen histories and pairs") {
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val model = NgramLm.trainBigram(train, "text")
    assert(model.vocabSize == 2L)
    // "x y": history x unseen (c1=0), pair unseen (c12=0) ->
    // nll = ln((0+2)/(0+1)) = ln 2
    val got = NgramLm.scorePerplexity(model,
      Seq((9L, "x y")).toDF("doc_id", "text")).collect().head
    assert(got.getLong(1) == 1L)
    assert(math.abs(got.getDouble(2) - math.log(2.0)) < 1e-12)
  }

  test("documents with fewer than two tokens score null, not zero") {
    val docs = Seq((1L, "a b"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val got = NgramLm.selfPerplexity(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.isNullAt(2)))).toMap
    assert(got(1L)._1 == 1L && !got(1L)._2)
    assert(got(2L) == ((0L, true)), "one-token doc must carry null nll")
    assert(got(3L) == ((0L, true)), "empty doc must carry null nll")
  }

  test("high-perplexity outliers rank above in-distribution documents") {
    // 30 template docs + 1 shuffled-gibberish doc: the filter's whole
    // point is that the outlier lands in the tail
    val normal = (0 until 30).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again"))
    val odd = Seq((99L, "dog the over quick lazy fox brown jumps again the"))
    val docs = (normal ++ odd).toDF("doc_id", "text")
    val rows = NgramLm.selfPerplexity(docs)
      .orderBy(col("ppl").desc).collect()
    assert(rows.head.getLong(0) == 99L,
      s"outlier not top-ranked: ${rows.head}")
  }
}
