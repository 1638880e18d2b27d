package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // raw local FS, no client-side .crc siblings: production filesystems
      // (HDFS, S3A) don't write them either, and ChecksumFileSystem DOUBLES
      // every metadata op on many-partition writes (measured ~30% on a
      // 2,400-dir write) — this makes local[n] behave like a cluster
      .config("spark.hadoop.fs.file.impl",
        "org.apache.hadoop.fs.RawLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.selected(sys.env.get("SPARK_GRAFT_ONLY"))
    var errors = List.empty[(String, String)]
    selected.foreach { case (name, fn) =>
      // coalesce(1) is a gate-scale convenience (sf0.01 results are tiny
      // and single-file output simplifies the DuckDB compare) — NOT a
      // pattern for production result sinks, which should keep the
      // query's natural output partitioning.
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors ::= (name, Option(e.getMessage).getOrElse(e.getClass.getName))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Self-describing failure record: every query that threw gets an
    // explicit entry (name → first line of the error) instead of being
    // silently absent from the output dir, and the process exits
    // nonzero so the driver can't mistake a partial dump for a green
    // run (VERDICT r6: 17 broken queries read as 78/81-green).
    val errJson = errors.reverse
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.linesIterator.nextOption().getOrElse(""))}" }
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
