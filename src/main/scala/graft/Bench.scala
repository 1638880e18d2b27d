package graft

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  * Failures are NOT silently folded into timings (the round-1 harness
  * swallowed exceptions into wall time): a failed query reports -1,
  * lands in `failures`, and the process exits nonzero.
  *
  * Each query is forced via a full-column xxhash64 checksum aggregate,
  * not `count()` — under count() Catalyst prunes unreferenced computed
  * columns, so pure-projection queries would time row counting instead
  * of their actual work. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Gate.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    var failures = List.empty[String]
    // dev loop: SPARK_GRAFT_ONLY=q1,q2 times just those queries
    val selected = SparkEntry.selected(sys.env.get("SPARK_GRAFT_ONLY"))
    // untimed warmup: the first query otherwise pays ~3s of one-off
    // session costs (codegen compiler, shuffle machinery, parquet footer
    // caches), which pollutes per-query regression tracking across rounds
    try spark.read.parquet(s"$sfDir/nation.parquet")
      .groupBy("n_regionkey").count().collect()
    catch { case scala.util.control.NonFatal(_) => () }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try {
          val df = fn(spark, sfDir)
          // bit_xor, not sum: ANSI mode (Spark 4 default) throws on long
          // overflow, and a 60k-row sum of 64-bit hashes overflows.
          df.agg(org.apache.spark.sql.functions.bit_xor(
            org.apache.spark.sql.functions.xxhash64(
              df.columns.toIndexedSeq.map(org.apache.spark.sql.functions.col): _*)))
            .head()
          true
        }
        // NonFatal only: an OOM must abort the run — recording it as
        // one failure and continuing with a wedged session would turn
        // every later query into a bogus regression
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failures ::= name; false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    import Gate.jstr
    val timed = results.filter(_._2 >= 0)
    val qs = results.map { case (k, v) => s"${jstr(k)}:$v" }
      .mkString("{", ",", "}")
    val fails = failures.map(jstr).mkString("[", ",", "]")
    val total = timed.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$fails,"sf":${jstr(sfDir)}}""")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
