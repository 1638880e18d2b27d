package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over tables (the dbt-tests /
  * Deequ-style surface): each check reduces to ONE aggregate — partial
  * map-side, tiny result — so a full constraint suite over a 100 TB
  * table costs one scan per table (Spark shares the scan across checks
  * on the same frame via one agg projection where possible) and moves
  * only (check, violations) rows to the driver. Nothing here collects
  * data; the report IS the aggregate.
  *
  * Extends the reference's validation theme (SURVEY.md §2.12) from
  * row-splitting to table-level constraint reporting.
  */
object QualityChecks {

  import org.apache.spark.sql.Column

  /** One named constraint over a frame: `violations` counts offending
    * rows (0 = pass). */
  final case class Check(name: String, frame: DataFrame, violation: Column)

  /** Rows where `c` is null. */
  def notNull(df: DataFrame, c: String): Check =
    Check(s"not_null:$c", df, col(c).isNull)

  /** Rows with a value outside the accepted set (nulls violate too —
    * use [[notNull]] separately if null is acceptable). */
  def acceptedValues(df: DataFrame, c: String, values: Seq[Any]): Check =
    Check(s"accepted_values:$c", df, !col(c).isin(values: _*) || col(c).isNull)

  /** Rows whose value falls outside [lo, hi] (nulls violate too, same
    * contract as [[acceptedValues]] — a suite combining this with
    * [[notNull]] on the same column counts a null row under BOTH
    * checks; use only one of them when that double-count matters). */
  def inRange(df: DataFrame, c: String, lo: Any, hi: Any): Check =
    Check(s"in_range:$c", df, col(c) < lit(lo) || col(c) > lit(hi) || col(c).isNull)

  /** Evaluate simple per-row checks, one aggregate PER TABLE: checks
    * over the same source fold into a single scan with N conditional
    * counts. Sameness is decided on the CANONICALIZED analyzed plan,
    * not object identity, so two `spark.read...` calls against the same
    * table still share one scan. Returns (check, violations). */
  def report(spark: SparkSession, checks: Seq[Check]): DataFrame = {
    import spark.implicits._
    val perFrame = checks.zipWithIndex
      .groupBy(_._1.frame.queryExecution.analyzed.canonicalized).toSeq.map {
        case (_, cs) =>
          val aggs = cs.map { case (c, i) =>
            count(when(c.violation, 1)).as(s"__v_$i")
          }
          val row = cs.head._1.frame.agg(aggs.head, aggs.tail: _*).head()
          cs.zipWithIndex.map { case ((c, _), j) => (c.name, row.getLong(j)) }
      }
    perFrame.flatten.toDF("check", "violations")
  }

  /** Duplicate-key count: rows beyond the first per key (0 = unique). */
  def duplicates(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("violations"))

  /** Orphan-key count: child rows whose key has no parent (anti-join —
    * the RI check as a single number). */
  def orphans(child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
}
