package graft

/** Plan-capture main for the optimization rounds: for each named query
  * (SPARK_GRAFT_ONLY, or every registered query), build its DataFrame
  * against SPARK_GRAFT_SF_DIR and write `explain("formatted")` to
  * `<outDir>/<name>_<tag>.txt`. Entries with eager scaffolding (DML,
  * staged fixtures) run that scaffolding as a side effect of building
  * the frame — the captured plan is the final declared frame, which is
  * what the oracle reads and the bench times.
  *
  * Usage: runMain graft.Plans <outDir> <tag>
  */
object Plans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Plans <outDir> <tag>")
    val outDir = java.nio.file.Paths.get(args(0))
    val tag = args(1)
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Gate.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val selected = SparkEntry.selected(sys.env.get("SPARK_GRAFT_ONLY"))
    var failed = List.empty[String]
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(outDir.resolve(s"${name}_$tag.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plans] $name -> ${name}_$tag.txt")
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[plans] $name FAILED: ${e.getMessage}")
        failed ::= name
      }
    }
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[plans] failed: ${failed.mkString(", ")}")
      sys.exit(1)
    }
  }
}
