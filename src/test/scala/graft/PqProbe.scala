package graft

object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = Gate.session("32")
    for (run <- 1 to 2) {
      val t0 = System.nanoTime()
      val df = Queries.all("embedding_ann_pq")(spark, "/root/testdata/sf0.1")
      df.collect()
      println(f"[probe] run$run total ${(System.nanoTime() - t0) / 1e9}%.1f s")
      Queries.lastAnnPqPhases.foreach { case (k, v) =>
        println(f"[probe] run$run $k $v%.1f s")
      }
    }
  }
}
