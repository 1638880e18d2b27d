package graft

import org.apache.spark.sql.functions._

/** Dev-loop probe (not part of the gate): decomposes ann_recall's wall
  * time into its construction steps, each forced with the same
  * hash-aggregate the bench uses. */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = Gate.session("32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(s"$dir/nation.parquet")
      .groupBy("n_regionkey").count().collect()

    def timeIt(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[ann] $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.agg(bit_xor(xxhash64(df.columns.toIndexedSeq.map(col): _*))).head()

    val emb = Tables.load(spark, dir, "embeddings")
    val queries = Queries.plantedAnnQueries(emb, 5)
    val dups = emb.filter(col("vec_id") < 5)
      .crossJoin(spark.range(10).select(col("id").as("__j")))
      .select(
        (lit(1000000L) + col("vec_id") * 100L + col("__j")).as("vec_id"),
        transform(col("embedding"), v =>
          (v * (lit(1.0d) + (col("__j") + 1L) * 0.001d)).cast("float"))
          .as("embedding"))
    var corpus: org.apache.spark.sql.DataFrame = null
    timeIt("corpus localCheckpoint") {
      corpus = emb.select("vec_id", "embedding").unionByName(dups)
        .localCheckpoint()
    }
    timeIt("bruteForceTopK") {
      force(operators.Similarity.bruteForceTopK(corpus, queries, k = 10))
    }
    timeIt("lshTopK") {
      force(operators.Similarity.lshTopK(corpus, queries, k = 10,
        probeRadius = 2))
    }
    timeIt("ivf trainCentroids") {
      force(operators.Similarity.trainCentroids(corpus, 16))
    }
    timeIt("ivfTopK (incl re-train)") {
      force(operators.Similarity.ivfTopK(corpus, queries, k = 10,
        nCentroids = 16, nProbe = 6))
    }
    timeIt("full annRecall") {
      force(Queries.annRecall(spark, dir))
    }
    timeIt("full annRecall again") {
      force(Queries.annRecall(spark, dir))
    }
    spark.stop()
  }
}
