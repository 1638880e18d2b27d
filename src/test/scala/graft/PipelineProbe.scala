package graft

/** Throwaway r17 probe: pipeline_e2e wall + phases at sf0.1. */
object PipelineProbe {
  def main(args: Array[String]): Unit = {
    val spark = Gate.session("32")
    for (run <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = Queries.all("pipeline_e2e")(spark, "/root/testdata/sf0.1")
      df.collect()
      println(f"[probe] run$run total ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Queries.lastPipelinePhases.foreach { case (k, v) =>
        println(f"[probe] run$run   $k ${v}%.2f s")
      }
    }
  }
}
