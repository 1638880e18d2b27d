package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{
  DataSourceV2Relation, DataSourceV2ScanRelation}

/** Optimizer rule answering a bare `COUNT(*)` over a graft snapshot
  * table from MANIFEST METADATA alone: the aggregate subtree collapses
  * to a [[LocalRelation]] holding the pre-computed count — zero file
  * I/O, the Delta (`OptimizeMetadataOnlyDeltaQuery`) / Iceberg
  * (snapshot `total-records`) contract. At 100 TB, `SELECT COUNT(*)
  * FROM t` is an O(manifest) driver lookup, not a cluster scan.
  *
  * The count is exact, not an estimate: per-file footer row counts are
  * recorded at commit (`file:rows`) and merge-on-read deletion-vector
  * cardinalities subtract without being decoded — so the rewrite stays
  * correct under MoR deletes, time travel (the handle pins one
  * manifest), and branches. The rewrite REFUSES anything it cannot
  * answer exactly: grouped/filtered/distinct counts, `count(col)`
  * (needs null counts), FILTER clauses, change-feed handles, and
  * manifests predating row-count recording all keep their scans.
  *
  * Registered by [[graft.GraftExtensions]]; a live session opts in via
  * `spark.experimental.extraOptimizations`. */
object MetadataOnlyCount extends Rule[LogicalPlan] {

  /** `count(lit)` of any non-null foldable literal == `count(*)` —
    * the only aggregate shape answerable from a row count alone. */
  private def isCountStar(e: NamedExpression): Option[Alias] = e match {
    case a @ Alias(AggregateExpression(
        Count(children), Complete, false, None, _), _)
        if children.forall(c => c.foldable && c.eval() != null) =>
      Some(a)
    case _ => None
  }

  /** The bare relation under the aggregate; `count(*)` references no
    * columns, so any interposed column-pruning Project is irrelevant —
    * but nothing else (a Filter changes the answer) may intervene.
    * Both pre- and post-pushdown forms appear depending on where the
    * rule was injected (extension rules run before
    * V2ScanRelationPushDown; `experimental.extraOptimizations` after);
    * a ScanRelation is only safe while its scan carries no pushed
    * filters/runtime filters — graft scans push filters only when a
    * logical Filter existed, which this pattern already excludes. */
  private def unfiltered(s: DataSourceV2ScanRelation)
      : Option[DataSourceV2Relation] = s.scan match {
    // parquet keeps a residual logical Filter for every pushed filter
    // (footer filtering is advisory), so a bare Aggregate-over-scan
    // with pushed filters should not exist — but the count must never
    // depend on that staying true
    case p: org.apache.spark.sql.execution.datasources.v2.parquet
        .ParquetScan if p.pushedFilters.nonEmpty => None
    case _ => Some(s.relation)
  }

  private def relationOf(plan: LogicalPlan): Option[DataSourceV2Relation] =
    plan match {
      case r: DataSourceV2Relation => Some(r)
      case s: DataSourceV2ScanRelation => unfiltered(s)
      case Project(_, r: DataSourceV2Relation) => Some(r)
      case Project(_, s: DataSourceV2ScanRelation) => unfiltered(s)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, aggExprs, child, _)
        if aggExprs.nonEmpty && aggExprs.forall(isCountStar(_).isDefined) =>
      (for {
        rel <- relationOf(child)
        table <- rel.table match {
          case t: GraftTable => Some(t)
          case _ => None
        }
        count <- table.metadataRowCount
      } yield LocalRelation(
        agg.output,
        Seq(InternalRow.fromSeq(aggExprs.map(_ => count))))
      ).getOrElse(agg)
  }
}
