package graft

/** Throwaway r17 probe: phase timing for pq_retrain_trigger at sf0.1. */
object PqTriggerProbe {
  def main(args: Array[String]): Unit = {
    val spark = Gate.session("32")
    for (run <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = Queries.all("pq_retrain_trigger")(spark, "/root/testdata/sf0.1")
      df.collect()
      println(f"[probe] run$run total ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Queries.lastPqTriggerPhases.foreach { case (k, v) =>
        println(f"[probe] run$run   $k ${v}%.2f s")
      }
    }
  }
}
