package graft

import org.apache.spark.sql.functions._

/** Dev-only decomposition probe for the skew smoke entry: times the
  * bare fact scan+agg, the unsalted sort-merge join, and the salted
  * join at several salt counts, at 1x and 10x — so the smoke's
  * configuration (base size, salt count, hot fraction) is chosen from
  * measured phase costs instead of guesses. Not part of the gate. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = Gate.session("32")
    val bigDir = "/tmp/graft_smoke_sf1"
    val nDim = 1000L * 1000
    val base = 10L * 1000 * 1000

    def t[A](tag: String)(body: => A): Double = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $tag%-28s $s%6.2f s")
      s
    }
    def fact(n: Long) = spark.read.parquet(s"$bigDir/skew_fact_$n")
    def dim() = spark.read.parquet(s"$bigDir/skew_dim").hint("merge")

    def scanOnly(n: Long): Unit =
      fact(n).agg(bit_xor(xxhash64(col("k"), col("v")))).head()
    def unsalted(n: Long): Unit =
      fact(n).join(dim(), Seq("k"))
        .agg(bit_xor(xxhash64(col("k"), col("v"), col("w")))).head()
    def salted(n: Long, salts: Int): Unit =
      operators.Skew.saltedEquiJoin(fact(n), dim(), "k", salts)
        .agg(bit_xor(xxhash64(col("k"), col("v"), col("w")))).head()

    // warm both shapes
    scanOnly(base); unsalted(base); salted(base, 8)
    for (n <- Seq(base, base * 10)) {
      println(s"[probe] ---- n=$n ----")
      t(s"scan+agg")(scanOnly(n))
      t(s"unsalted join")(unsalted(n))
      for (s <- Seq(4, 8, 16, 32))
        t(s"salted join salts=$s")(salted(n, s))
    }
    spark.stop()
  }
}
