package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, AttributeReference, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{
  DataSourceV2Relation, DataSourceV2ScanRelation}

/** Optimizer rule answering bare `COUNT(*)` / `MIN(col)` / `MAX(col)`
  * aggregates over a graft snapshot table from MANIFEST METADATA
  * alone: the aggregate subtree collapses to a [[LocalRelation]]
  * holding the pre-computed values — zero file I/O, the Delta
  * (`OptimizeMetadataOnlyDeltaQuery`) / Iceberg (snapshot summary)
  * contract. At 100 TB, `SELECT COUNT(*), MIN(day), MAX(day) FROM t`
  * is an O(manifest) driver lookup, not a cluster scan.
  *
  * Every answer is exact, never an estimate:
  *  - COUNT(*): per-file footer row counts recorded at commit
  *    (`file:rows`) minus merge-on-read deletion-vector cardinalities
  *    (read without decoding the bitmap) — exact under MoR deletes,
  *    time travel (the handle pins one manifest), and branches.
  *  - COUNT(col): per-file footer NULL counts recorded at commit
  *    (`nulls:<col>`) subtracted from the row counts — only when NO
  *    deletion vector exists (the manifest does not know how many
  *    HIDDEN rows were null) and only for top-level primitive columns
  *    (nested leaves conflate parent-null with leaf-null; partition
  *    columns have no footer chunk). Distinct counts refuse.
  *  - MIN/MAX: per-file column stats folded across the manifest —
  *    only when NO deletion vector exists (a hidden row may be the
  *    extreme) and only for loss-free stat families (plain integrals
  *    and ASCII strings; parquet double stats are NaN-hazardous and
  *    keep their scan). Parquet stats exclude nulls, matching SQL
  *    MIN/MAX; an all-null file carries no stats entry and refuses.
  *
  * The rewrite REFUSES anything it cannot answer exactly: grouped /
  * filtered / distinct aggregates, FILTER clauses, expressions over
  * columns (`min(a+1)`, `count(a+1)`), change-feed handles, and
  * manifests predating row-count / null-count recording all keep
  * their scans. ALL aggregates in the list must be answerable or none
  * rewrite.
  *
  * Registered by [[graft.GraftExtensions]]; a live session opts in via
  * `spark.experimental.extraOptimizations`. */
object MetadataOnlyCount extends Rule[LogicalPlan] {

  /** Idempotently register the rule on a LIVE session (extensions can
    * only be added at build time); [[uninstall]] undoes it. ONE
    * registration authority — callers must not hand-roll the append. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_ eq this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  def uninstall(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq this)

  /** The bare relation under the aggregate plus the LEAF node whose
    * output the aggregate's attribute references resolve against;
    * a column-pruning Project in between is irrelevant to these
    * aggregates — but nothing else (a Filter changes the answers) may
    * intervene. Both pre- and post-pushdown forms appear depending on
    * where the rule was injected (extension rules run before
    * V2ScanRelationPushDown; `experimental.extraOptimizations`
    * after). */
  private def relationOf(plan: LogicalPlan)
      : Option[(DataSourceV2Relation, LogicalPlan)] =
    plan match {
      case r: DataSourceV2Relation => Some((r, r))
      case s: DataSourceV2ScanRelation => unfiltered(s)
      case Project(_, r: DataSourceV2Relation) => Some((r, r))
      case Project(_, s: DataSourceV2ScanRelation) => unfiltered(s)
      case _ => None
    }

  private def unfiltered(s: DataSourceV2ScanRelation)
      : Option[(DataSourceV2Relation, LogicalPlan)] = s.scan match {
    // ANY consumed filter refuses. Data filters leave a residual
    // logical Filter for parquet (footer filtering is advisory), so a
    // bare Aggregate-over-scan with pushed data filters should not
    // exist — but PARTITION filters are consumed EXACTLY by
    // FileScanBuilder (no residual Filter node remains), so a
    // partition-pruned count reaches here as a bare aggregate and a
    // whole-table metadata answer would silently drop the WHERE
    // clause. Only a provably filter-free parquet scan qualifies;
    // unknown scan types refuse outright.
    case p: org.apache.spark.sql.execution.datasources.v2.parquet
        .ParquetScan
        if p.pushedFilters.isEmpty && p.partitionFilters.isEmpty &&
           p.dataFilters.isEmpty =>
      Some((s.relation, s))
    case _ => None
  }

  /** The metadata answer for ONE aggregate expression, or None when
    * this expression cannot be answered exactly. */
  private def answer(table: GraftTable, leaf: LogicalPlan,
                     e: NamedExpression): Option[Any] = e match {
    // count(lit) of any non-null foldable literal == count(*)
    case Alias(AggregateExpression(
        Count(children), Complete, false, None, _), _)
        if children.forall(c => c.foldable && c.eval() != null) =>
      table.metadataRowCount
    // count(col): rows minus the manifest's per-file null counts
    case Alias(AggregateExpression(
        Count(Seq(attr: AttributeReference)), Complete, false, None, _), _)
        if leaf.outputSet.contains(attr) =>
      table.metadataColumnCount(attr.name)
    case Alias(AggregateExpression(
        Min(attr: AttributeReference), Complete, false, None, _), _)
        if leaf.outputSet.contains(attr) =>
      table.metadataExtreme(attr.name, attr.dataType, isMin = true)
    case Alias(AggregateExpression(
        Max(attr: AttributeReference), Complete, false, None, _), _)
        if leaf.outputSet.contains(attr) =>
      table.metadataExtreme(attr.name, attr.dataType, isMin = false)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, aggExprs, child, _) if aggExprs.nonEmpty =>
      (for {
        (rel, leaf) <- relationOf(child)
        table <- rel.table match {
          case t: GraftTable => Some(t)
          case _ => None
        }
        values <- {
          val opts = aggExprs.map(answer(table, leaf, _))
          if (opts.forall(_.isDefined)) Some(opts.map(_.get)) else None
        }
      } yield LocalRelation(
        agg.output, Seq(InternalRow.fromSeq(values)))
      ).getOrElse(agg)
  }
}
