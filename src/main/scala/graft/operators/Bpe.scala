package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Trainable byte-pair encoding over a document corpus — the
  * tokenizer-training stage of an LLM data pipeline (the reference
  * pipeline counts whitespace tokens; real corpus preparation trains
  * subword vocabularies).
  *
  * Scale design (100 TB): BPE training state is the WORD-COUNT
  * dictionary, not the corpus — the same shape every production
  * trainer (GPT-2's, SentencePiece's, HuggingFace's) uses. The engine
  * keeps the corpus-sized work distributed and narrow:
  *   - [[wordHistogram]]: ONE distributed aggregation over the corpus
  *     (explode → partial-agg count → TakeOrdered top-V), the only
  *     O(corpus) pass in training;
  *   - [[trainMerges]]: the merge loop runs on the capped histogram
  *     driver-side — O(vocab · word-length) per merge, independent of
  *     corpus size (rare tail words cannot win a merge anyway: a
  *     merge's count is bounded by its words' total frequency);
  *   - [[withBpeTokens]]: encoding is a PER-PARTITION narrow map with
  *     the merge ranks broadcast in the task closure — no shuffle, no
  *     driver involvement, embarrassingly parallel over 100 TB.
  */
object Bpe {

  /** Pre-tokenization: lowercase ALPHANUMERIC runs — the regex
    * approximation every BPE trainer applies before merging (GPT-2
    * splits off punctuation the same way). Restricting tokens to
    * [a-z0-9] also guarantees the `;`/space delimiters of the
    * canonical encoded form can never occur INSIDE a token, which the
    * serialization (and its oracle) depend on. */
  private[graft] def preTokenize(text: String): Array[String] =
    text.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Column form of [[preTokenize]] — Spark's lower() is
    * locale-independent, matching Locale.ROOT on the JVM side. */
  private def preTokenizeCol(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), w => length(w) > 0)

  /** Top-`maxVocab` (word, count) pairs by frequency (ties to the
    * lexicographically smaller word — deterministic across runs and
    * partitionings). One distributed count; only the capped histogram
    * reaches the driver. */
  def wordHistogram(docs: DataFrame, textCol: String,
                    maxVocab: Int): Array[(String, Long)] =
    docs.select(explode(preTokenizeCol(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

  /** The classic BPE training loop over a word histogram: per round,
    * count all adjacent symbol pairs weighted by word frequency, merge
    * the most frequent (ties to the lexicographically smallest pair —
    * fully deterministic), stop early when the best count falls below
    * `minCount`. Returns the ordered merge list; order IS the rank. */
  def trainMerges(hist: Array[(String, Long)], numMerges: Int,
                  minCount: Long = 2L): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] =
      hist.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      var best: (String, String) = null
      var bestC = 0L
      counts.foreach { case (p, c) =>
        // full order on (count desc, pair asc): deterministic however
        // the hash map iterates
        if (c > bestC || (c == bestC && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2))))
          { best = p; bestC = c }
      }
      if (best == null || bestC < minCount) exhausted = true
      else {
        merges += best
        val merged = best._1 + best._2
        words = words.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 &&
                  syms(i + 1) == best._2) { out += merged; i += 2 }
              else { out += syms(i); i += 1 }
            }
            (out.toArray, c)
          }
        }
      }
      round += 1
    }
    merges.result()
  }

  /** [[wordHistogram]] + [[trainMerges]] end to end. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxVocab: Int = 100000, minCount: Long = 2L): Seq[(String, String)] =
    trainMerges(wordHistogram(docs, textCol, maxVocab), numMerges, minCount)

  /** GPT-2-style encode of one word under merge `ranks`: repeatedly
    * merge the LOWEST-RANK adjacent pair present (all its occurrences,
    * leftmost first) until none applies. Unknown characters pass
    * through as single-symbol tokens. */
  def encodeWord(word: String,
                 ranks: Map[(String, String), Int]): Array[String] = {
    if (word.isEmpty) return Array.empty
    var syms: Array[String] = word.map(_.toString).toArray
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair == null) done = true
      else {
        val merged = bestPair._1 + bestPair._2
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == bestPair._1 &&
              syms(j + 1) == bestPair._2) { out += merged; j += 2 }
          else { out += syms(j); j += 1 }
        }
        syms = out.toArray
      }
    }
    syms
  }

  /** Append BPE token columns to `df`: `n_tokens` (count across all
    * words) and `encoded` — the canonical serialized form, each token
    * suffix-terminated with `;` and words joined by a space (tokens
    * are [[preTokenize]]d alphanumeric runs, so neither delimiter can
    * occur inside a token — the invariant the count-of-`;` oracle
    * formulation rests on). Per-partition narrow map: the rank map
    * builds once per task from the closure-shipped merge list. */
  def withBpeTokens(df: DataFrame, textCol: String,
                    merges: Seq[(String, String)]): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("n_tokens", LongType, nullable = false),
      StructField("encoded", StringType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(textCol)
    val mergeList = merges.toArray
    df.mapPartitions { rows =>
      val ranks = mergeList.zipWithIndex.toMap
      rows.map { r =>
        val text = Option(r.getString(idx)).getOrElse("")
        val words = preTokenize(text)
        var n = 0L
        val sb = new StringBuilder
        var wi = 0
        while (wi < words.length) {
          if (wi > 0) sb += ' '
          val toks = encodeWord(words(wi), ranks)
          n += toks.length
          toks.foreach { t => sb ++= t; sb += ';' }
          wi += 1
        }
        Row.fromSeq(r.toSeq ++ Seq(n, sb.result()))
      }
    }(enc)
  }
}
