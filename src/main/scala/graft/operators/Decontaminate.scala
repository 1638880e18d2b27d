package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Benchmark decontamination: remove corpus documents that share any
  * long token n-gram with an evaluation/benchmark set — the overlap
  * rule training-data papers apply before releasing a corpus (a single
  * shared n-token sequence marks the document contaminated; short
  * grams would flag everything, so n defaults to 8 whole tokens).
  *
  * Shape (scale notes): both sides shingle with a shuffle-free narrow
  * map; the membership probe is a semi-join on the shingle hash. The
  * benchmark side is eval-suite-sized — tiny next to a 100 TB corpus —
  * so its distinct fingerprint set broadcasts and the corpus is never
  * shuffled; the contaminated-id set (bounded by the corpus row count,
  * in practice a sliver) drives one anti-join. No all-pairs text
  * comparison anywhere.
  */
object Decontaminate {

  private def fps(df: DataFrame, idCol: String, textCol: String,
                  n: Int): DataFrame =
    df.withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      .select(col(idCol),
        explode(TextAnalysis.tokenNgramHashes(col("__toks"), n)).as("fp"))

  /** Distinct ids of corpus documents sharing ≥1 n-token shingle with
    * the benchmark. */
  def contaminatedIds(corpus: DataFrame, bench: DataFrame,
                      idCol: String, textCol: String,
                      n: Int = 8): DataFrame = {
    val benchFps = broadcast(
      fps(bench, idCol, textCol, n).select("fp").distinct())
    fps(corpus, idCol, textCol, n)
      .join(benchFps, Seq("fp"), "left_semi")
      .select(idCol).distinct()
  }

  /** The corpus minus contaminated documents. */
  def clean(corpus: DataFrame, bench: DataFrame,
            idCol: String, textCol: String, n: Int = 8): DataFrame =
    corpus.join(contaminatedIds(corpus, bench, idCol, textCol, n),
      Seq(idCol), "left_anti")
}
