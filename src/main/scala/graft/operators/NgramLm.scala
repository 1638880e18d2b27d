package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** N-gram language-model perplexity — the classic corpus quality
  * filter (CCNet-style pipelines score every document under a language
  * model and drop the high-perplexity tail; gibberish, boilerplate and
  * wrong-language text all score high).
  *
  * The model is a bigram LM with add-one smoothing:
  * P(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V), where c(w1·) counts
  * bigram HISTORIES (occurrences of w1 as a bigram left) and V is the
  * corpus vocabulary size. A document's score is the mean negative
  * log-likelihood over its bigrams; perplexity is its exponential.
  *
  * Scale design (100 TB): the model is two DISTRIBUTED count tables
  * (histories, pairs) built by plain grouped aggregations — never
  * collected; scoring joins each document's bigrams against them
  * (equi-joins AQE broadcasts when the model is small and shuffles
  * when it is not) and folds one grouped mean per document. Every
  * stage is counts, joins and one scalar ln — no UDFs, fully
  * codegen-friendly. */
object NgramLm {

  /** (id, w1, w2) bigram rows from an ALREADY-TOKENIZED (id, ts)
    * frame — one narrow explode, no re-tokenization. */
  private def tokBigrams(tok: DataFrame, idCol: String): DataFrame = {
    val ts = col("__ts")
    val n = size(ts)
    val pairs = when(n >= 2,
      zip_with(slice(ts, lit(1), n - 1), slice(ts, lit(2), n - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    tok.select(col(idCol), explode(pairs).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
  }

  /** (id, __ts) tokenized projection — the ONE regex pass over the
    * corpus; every downstream stage derives from this frame. */
  private def tokenized(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    docs.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("__ts"))

  /** (id, w1, w2) bigram rows of each document — one narrow explode. */
  private def docBigrams(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    tokBigrams(tokenized(docs, idCol, textCol), idCol)

  /** The trained model: history counts c(w1·), pair counts c(w1,w2),
    * and the vocabulary size V — the first two stay DataFrames (at
    * corpus scale they are large), V is one scalar. */
  final case class BigramModel(histories: DataFrame, pairs: DataFrame,
                               vocabSize: Long)

  def trainBigram(train: DataFrame, textCol: String,
                  idCol: String = "doc_id"): BigramModel = {
    val big = docBigrams(train, idCol, textCol)
    // ONE shuffle of the raw bigram explode: c(w1·) = Σ_w2 c(w1,w2)
    // exactly (every w1-as-left occurrence is in exactly one pair
    // group), so histories re-aggregate the already-reduced pair
    // table instead of shuffling the raw bigrams a second time
    val pairs = big.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val hist = pairs.groupBy("w1").agg(sum("c12").as("c1"))
    val v = train.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .agg(count_distinct(col("w"))).head().getLong(0)
    BigramModel(hist, pairs, v)
  }

  /** Score `docs` under `model`: (id, n_bigrams, avg_nll, ppl).
    * Bigrams unseen in training smooth to (0 + 1) in the numerator;
    * histories unseen in training smooth to (0 + V) in the
    * denominator — both via left joins, so scoring a disjoint corpus
    * is well-defined. Documents with fewer than two tokens carry null
    * scores (no bigrams to score — a 0 would fake a perfect model). */
  def scorePerplexity(model: BigramModel, docs: DataFrame,
                      idCol: String = "doc_id",
                      textCol: String = "text",
                      preBigrams: Option[DataFrame] = None): DataFrame = {
    val big = preBigrams.getOrElse(docBigrams(docs, idCol, textCol))
    val nll = big
      .join(model.histories, Seq("w1"), "left")
      .join(model.pairs, Seq("w1", "w2"), "left")
      .withColumn("__nll", log(
        (coalesce(col("c1"), lit(0L)) + model.vocabSize).cast("double") /
          (coalesce(col("c12"), lit(0L)) + lit(1L)).cast("double")))
    val agg = nll.groupBy(idCol).agg(
      count(lit(1)).as("n_bigrams"), avg(col("__nll")).as("avg_nll"))
    docs.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_nll"), exp(col("avg_nll")).as("ppl"))
  }

  /** Self-scoring: every document scored under the model trained on
    * the whole corpus — the standard filtering setup (a document that
    * is unlike the corpus that contains it is exactly the outlier the
    * filter wants).
    *
    * Fused single-tokenization path (r18): the generic
    * train-then-score composition regex-tokenized the corpus THREE
    * times (training bigrams, vocabulary count, scoring bigrams) and
    * shuffled the raw bigram explode twice — at sf0.1 that was over
    * half the entry's wall. Here the tokenized (id, tokens) frame is
    * persisted once and every stage — vocabulary, pair counts,
    * histories (re-aggregated from pairs), scoring bigrams — derives
    * from it; the model tables and arithmetic are unchanged, so the
    * scores are identical to the generic path (NgramLmSpec pins both
    * against the same hand-computed fixture). The persist is the
    * scale-honest design too: a multi-pass algorithm over a 100 TB
    * corpus wants the token stream materialized once
    * (MEMORY_AND_DISK spills, never recomputes the regex), then
    * released. */
  def selfPerplexity(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val tok = tokenized(docs, idCol, textCol).persist()
    try {
      val big = tokBigrams(tok, idCol)
      val pairs = big.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val hist = pairs.groupBy("w1").agg(sum("c12").as("c1"))
      // the vocabulary count is the forcing action: it populates the
      // token cache every later stage reads
      val v = tok.select(explode(col("__ts")).as("w"))
        .filter(length(col("w")) > 0)
        .agg(count_distinct(col("w"))).head().getLong(0)
      val result =
        scorePerplexity(BigramModel(hist, pairs, v), docs, idCol, textCol,
          preBigrams = Some(big))
      // eager: the scoring joins must run while the token cache is live
      result.localCheckpoint(eager = true)
    } finally tok.unpersist()
  }
}
