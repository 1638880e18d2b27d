package graft

import org.apache.spark.sql.functions.{bit_xor, col, xxhash64}

/** r18 probe: measure the tokenization-family bench entries (the ones
  * the r17 verdict flagged as regressed vs their r15/r16 committed
  * times) min-of-3 in one session at sf0.1, exactly as Bench forces
  * them. Run once at HEAD (fused tokens), once with tokens() reverted
  * to the two-pass form, compare in-session. Subset absolute numbers
  * are NOT comparable to full-sweep committed numbers (session warmup
  * amortization) — only to each other. */
object TokFamilyProbe {
  def main(args: Array[String]): Unit = {
    val spark = Gate.session("32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = Seq("ngram_perplexity", "minhash_neardup", "corpus_curation",
      "ngram_jaccard_neardup", "stream_dedup_parity", "exact_dedup",
      "decontaminate", "quality_checks")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.agg(bit_xor(xxhash64(df.columns.toIndexedSeq.map(col): _*))).head()
      (System.nanoTime() - t0) / 1e9
    }
    // one untimed warmup pass over the whole family, then 3 timed
    // rounds interleaved (round-robin, not per-entry back-to-back) so
    // a host window hits all entries equally
    names.foreach(once)
    val best = scala.collection.mutable.Map[String, Double]()
    for (rep <- 1 to 3; n <- names) {
      val t = once(n)
      best(n) = math.min(best.getOrElse(n, Double.MaxValue), t)
      println(f"[tokfam] rep=$rep $n $t%.2f s")
    }
    println(names.map(n => f"$n=${best(n)}%.2f").mkString("[tokfam] BEST ", " ", ""))
    println(f"[tokfam] FAMILY_SUM ${names.map(best).sum}%.2f s")
    spark.stop()
  }
}
