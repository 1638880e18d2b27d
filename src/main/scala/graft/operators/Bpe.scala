package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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

  /** Pre-tokenization: lowercase UNICODE letter/digit runs — the
    * regex approximation every BPE trainer applies before merging
    * (GPT-2 splits off punctuation the same way), across ALL scripts:
    * accented Latin, Cyrillic, Greek, CJK, Arabic… all survive (the
    * former `[a-z0-9]` restriction silently tokenized every
    * non-English document to nothing). `;` (U+003B) and space are
    * punctuation — neither is ever `\p{L}`/`\p{N}` — so the
    * `;`/space delimiters of the canonical encoded form still cannot
    * occur INSIDE a token, the invariant the serialization (and its
    * oracle) depend on.
    *
    * Lowercasing goes through Spark's own [[UTF8String.toLowerCase]]
    * so this JVM path and [[preTokenizeCol]]'s `lower()` are the SAME
    * function by construction. Oracle parity (DuckDB `lower()` +
    * RE2 `[^\p{L}\p{N}]+`) was verified per-codepoint over all of
    * U+0020..U+2FFFF: the only divergences are U+0130 (İ: JVM full
    * mapping appends U+0307) + 3 Unicode-12 title/lower additions,
    * and codepoints added to Unicode after the JDK 17 tables —
    * none reachable from any oracle fixture. */
  private[graft] def preTokenize(text: String): Array[String] =
    UTF8String.fromString(text).toLowerCase.toString
      .split(graft.functions.TextAnalysis.TokenRunSplitRe)
      .filter(_.nonEmpty)

  /** Column form of [[preTokenize]] — identical by construction:
    * `lower()` on the default binary collation IS
    * [[UTF8String.toLowerCase]], and the split pattern is the SAME
    * shared constant [[graft.functions.TextAnalysis.TokenRunSplitRe]]
    * the whole text path (and its oracles) interpolate. */
  private def preTokenizeCol(text: Column): Column =
    filter(split(lower(text), graft.functions.TextAnalysis.TokenRunSplitRe),
      w => length(w) > 0)

  /** UTF-8 byte order (codepoint order) — the one string order all
    * three training stages share: Spark's `orderBy` on the histogram
    * (UTF8String binary comparison), this driver-side merge loop's
    * tie-break, and the DuckDB oracle's `ORDER BY`. */
  private def u8lt(a: String, b: String): Boolean =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0

  /** A word's initial symbol sequence: one symbol per CODEPOINT (not
    * UTF-16 code unit — astral-plane letters must not shear into
    * surrogate halves; the oracle's RE2 `.` walks codepoints). */
  private[graft] def symbols(word: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

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
      hist.map { case (w, c) => (symbols(w), c) }
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
        // the hash map iterates. Pair order is UTF-8 BYTE order
        // (UTF8String.compareTo), not Java String's UTF-16 code-unit
        // order: wordHistogram's orderBy and the DuckDB oracle's
        // ORDER BY both compare UTF-8 bytes, and the two orders
        // disagree exactly where a supplementary-plane pair ties with
        // a BMP pair in U+E000..U+FFFF (surrogates sort below those
        // code units; their UTF-8 encodings sort above).
        if (c > bestC || (c == bestC && best != null &&
            (u8lt(p._1, best._1) ||
              (p._1 == best._1 && u8lt(p._2, best._2)))))
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
    var syms: Array[String] = symbols(word)
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
