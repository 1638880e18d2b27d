package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length == 2,
      s"usage: graft.Verify <sfDir> <outDir> (got ${args.length} args: " +
        args.mkString(", ") + ")")
    val Array(sfDir, outDir) = args
    val spark = Gate.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.selected(sys.env.get("SPARK_GRAFT_ONLY"))
    var errors = List.empty[(String, String)]
    selected.foreach { case (name, fn) =>
      // coalesce(1) is a gate-scale convenience (sf0.01 results are tiny
      // and single-file output simplifies the DuckDB compare) — NOT a
      // pattern for production result sinks, which should keep the
      // query's natural output partitioning.
      // LTZ timestamps dump as NTZ: the session writes INT64-micros
      // parquet (isAdjustedToUTC=true), which pandas reads TZ-AWARE
      // while DuckDB's oracle timestamps are naive — under the UTC
      // session the cast is the wall-clock identity, and the compare
      // sees the same naive micros both sides (the old INT96 dumps
      // were naive by accident of the legacy encoding)
      try {
        val out = fn(spark, sfDir)
        val cols = out.schema.fields.toIndexedSeq.map { f =>
          if (f.dataType == org.apache.spark.sql.types.TimestampType)
            org.apache.spark.sql.functions.col(f.name)
              .cast(org.apache.spark.sql.types.TimestampNTZType).as(f.name)
          else org.apache.spark.sql.functions.col(f.name)
        }
        out.select(cols: _*).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      }
      catch { case scala.util.control.NonFatal(e) =>
        // NonFatal only: an OOM must abort the run, not wedge the
        // session and cascade bogus failures through every later query
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors ::= (name, Option(e.getMessage).getOrElse(e.getClass.getName))
        // a failure BEFORE the write action started (analysis error,
        // builder require) leaves a PRIOR run's dump intact in a
        // reused outDir — delete it, or the compare reads stale
        // results as green, exactly what the error record exists to
        // prevent
        try org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(s"$outDir/$name"))
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    import Gate.jstr
    // oracle entries only for the SELECTED queries: a dev-loop subset
    // run would otherwise hand the compare tool ~100 oracles with one
    // result dump and bury the real outcome in no-result noise
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected.contains(k) }
      .map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Self-describing failure record: every query that threw gets an
    // explicit entry (name → first line of the error) instead of being
    // silently absent from the output dir, and the process exits
    // nonzero so the driver can't mistake a partial dump for a green
    // run (VERDICT r6: 17 broken queries read as 78/81-green).
    val errJson = errors.reverse
      .map { case (k, v) =>
        s"${jstr(k)}: ${jstr(v.linesIterator.nextOption().getOrElse(""))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(s"[verify] ${errors.size} queries FAILED: " +
        errors.map(_._1).mkString(", "))
      sys.exit(1)
    }
  }
}
