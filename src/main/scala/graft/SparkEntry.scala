package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.starJoinAgg(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracle

  /** Dev-loop subset selection shared by the Verify and Bench mains
    * (`SPARK_GRAFT_ONLY=a,b,c`). Unknown names fail fast — a typo must
    * not read as a clean run of nothing. The driver never sets the
    * variable, so the gates always run the full surface. */
  def selected(only: Option[String])
      : Map[String, (SparkSession, String) => DataFrame] = {
    val names = only.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    names.foreach { ns =>
      val unknown = ns.diff(queries.keySet)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names unknown queries: ${unknown.mkString(", ")}")
    }
    names.fold(queries)(ns => queries.filter(kv => ns(kv._1)))
  }
}
