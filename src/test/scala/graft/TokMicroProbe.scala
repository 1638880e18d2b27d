package graft

import org.apache.spark.sql.functions._

/** Throwaway r17 probe: fused one-pass tokens() vs the r16 two-pass
  * form, alternating in one session over sf0.1 documents. */
object TokMicroProbe {
  def main(args: Array[String]): Unit = {
    val spark = Gate.session("32")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("text")
    val cjk = "[\\x{3400}-\\x{4DBF}\\x{4E00}-\\x{9FFF}\\x{F900}-\\x{FAFF}\\x{20000}-\\x{2FA1F}]"
    def oldTokens(c: org.apache.spark.sql.Column) =
      filter(split(lower(regexp_replace(c, s"($cjk)", " $1 ")),
        "[^\\p{L}\\p{N}]+"), t => length(t) > 0)
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[tok] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s (sum=$n)")
    }
    for (_ <- 1 to 3) {
      time("old") { docs.agg(sum(size(oldTokens(col("text"))))).head().getLong(0) }
      time("new") { docs.agg(sum(size(functions.TextAnalysis.tokens(col("text"))))).head().getLong(0) }
    }
  }
}
