package graft

import org.apache.spark.sql.functions._

/** Dev-loop probe (not part of the gate): isolates the pipeline's
  * dominant cost — a dynamic-partition parquet write fanning ~150k
  * rows over ~2,400 date dirs — and times it under candidate writer
  * configurations, so per-file overhead hypotheses are measured
  * instead of guessed.
  *
  * `sbt 'Test/runMain graft.WriteShapeProbe'` */
object WriteShapeProbe {
  def main(args: Array[String]): Unit = {
    val spark = Gate.session("32")
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("date", date_format(col("o_orderdate"), "yyyy-MM-dd"))
    orders.persist().count()
    val out = "/tmp/graft_write_probe"

    def timeIt(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }

    for (round <- 1 to 2) {
      timeIt(s"r$round v2+nosuccess") {
        orders.repartition(32, col("date")).write.mode("overwrite")
          .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
          .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
          .partitionBy("date").parquet(s"$out/a")
      }
      timeIt(s"r$round v1 defaults") {
        orders.repartition(32, col("date")).write.mode("overwrite")
          .partitionBy("date").parquet(s"$out/b")
      }
      timeIt(s"r$round v2 only") {
        orders.repartition(32, col("date")).write.mode("overwrite")
          .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
          .partitionBy("date").parquet(s"$out/c")
      }
      timeIt(s"r$round nosuccess only") {
        orders.repartition(32, col("date")).write.mode("overwrite")
          .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
          .partitionBy("date").parquet(s"$out/d")
      }
      timeIt(s"r$round v1+nosuccess concurrent-rename probe") {
        orders.repartition(32, col("date")).write.mode("overwrite")
          .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
          .option("mapreduce.fileoutputcommitter.algorithm.version", "1")
          .partitionBy("date").parquet(s"$out/e")
      }
    }
    spark.stop()
  }
}
