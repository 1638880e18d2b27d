package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate views over a [[SnapshotTable]]
  * (Delta/Databricks "materialized view with incremental refresh",
  * Materialize/Flink-style maintained aggregation — reference analog:
  * the nightly full-recompute aggregation jobs, `orders_etl.py`, which
  * rescan the table each run).
  *
  * The view IS a [[SnapshotTable]] keyed by an injective encoding of
  * the group columns, refreshed from the source's change feed
  * ([[SnapshotTable.changesDelta]]): cost per refresh is O(changed
  * rows) + O(changed groups), NEVER O(source table) — the property
  * that makes a daily-revenue rollup over a 100 TB fact table
  * maintainable. Exactly-once without a transaction coordinator: the
  * source-version watermark is STAGED onto the refresh's own manifest
  * commit ([[SnapshotTable.stageProperties]]), so the merged rows and
  * the watermark land atomically — a crashed refresh re-applies the
  * same span onto the same old state, it can never double-apply.
  *
  * Construct the view handle CLUSTERED by [[KeyCol]]
  * (`statsCols = clusterBy = Seq(MaterializedAgg.KeyCol)`): the
  * refresh merge is then stats-scoped to the files holding touched
  * groups, so a refresh rewrites O(touched groups) of the view, not
  * the whole view — the difference between a maintained rollup and a
  * nightly rebuild once the view itself is large.
  *
  * Two refresh strategies, chosen by what the measures allow:
  *  - [[refreshAdditive]] — sums and counts (avg = sum/count at read).
  *    Folds signed deltas (`after` adds, `before` subtracts) straight
  *    from the feed; no source scan at all. Emptied groups (net count
  *    zero) are deleted from the view in the same commit
  *    ([[SnapshotTable.upsertDelete]]).
  *  - [[refreshRecompute]] — arbitrary aggregates (min/max/distinct…)
  *    that cannot fold under deletes. The feed contributes only the
  *    DIRTY group keys; those groups recompute from the source scoped
  *    by a broadcast semi-join (stats/cluster pruning applies when the
  *    source is clustered by the group key), and vanished groups are
  *    deleted. O(changed groups' data), still never O(table).
  */
object MaterializedAgg {

  /** View table property holding the last source version folded in. */
  val SourceVersionProp = "graft.mv.sourceVersion"

  /** Synthesized single-column primary key for the view: injective
    * over the group tuple, null-distinguishing (`\u0000` marks NULL —
    * url_encode output never starts with an unescaped control byte),
    * never itself null. */
  val KeyCol = "__mv_key"

  /** Maintained row count per group; doubles as the liveness flag
    * (net zero => the group left the view). */
  val CountCol = "__mv_count"

  private val DropCol = "__mv_drop"

  private def keyExpr(keys: Seq[String]): Column =
    concat_ws("\u0001", keys.map(k =>
      when(col(k).isNull, lit("\u0000"))
        .otherwise(concat(lit("="), url_encode(col(k).cast("string"))))): _*)

  /** Stamped on every refresh commit; bumped if [[keyExpr]]'s
    * encoding ever changes. A view persisted under a DIFFERENT key
    * format must be rebuilt, not folded onto — the merge would miss
    * every old-format group and double-list them silently. */
  val KeyFormatProp = "graft.mv.keyFormat"
  private val KeyFormat = "1"

  /** The source version the view has absorbed — the shared watermark
    * contract of the batch refresh AND the streaming maintainer: a
    * missing view (or an EMPTY one, the SQL
    * `CREATE TABLE … TBLPROPERTIES(…)` declared-but-never-refreshed
    * case) folds from 0; a view WITH rows but no watermark is an
    * arbitrary table — refuse to corrupt it. Also refuses a non-empty
    * view whose [[KeyFormatProp]] predates the current key encoding. */
  private[graft] def absorbedVersion(view: SnapshotTable): Long =
    if (!view.exists) 0L
    else view.properties.get(SourceVersionProp).flatMap(_.toLongOption)
      .map { w =>
        if (!view.properties.get(KeyFormatProp).contains(KeyFormat) &&
            view.candidateFiles().nonEmpty)
          throw new IllegalStateException(
            s"view at ${view.path} was persisted under group-key " +
              s"format ${view.properties.getOrElse(KeyFormatProp, "0")} " +
              s"(current $KeyFormat) — a fold would miss every " +
              "old-format group; drop and rebuild the view")
        w
      }
      .getOrElse {
        if (view.candidateFiles().isEmpty) 0L
        else throw new IllegalStateException(
          s"view carries no $SourceVersionProp — not a maintained " +
            "view (create it through refreshAdditive/refreshRecompute)")
      }

  /** The (fromV, toV] span still owed to the view, or None when
    * already current. Refuses a watermark AHEAD of the source head —
    * that means the source was restored/recreated under the view, and
    * folding would corrupt silently; the caller must rebuild. */
  private def span(src: SnapshotTable, view: SnapshotTable)
      : Option[(Long, Long)] = {
    val toV = src.currentVersion.getOrElse(
      throw new IllegalStateException("source has no committed snapshot"))
    val fromV = absorbedVersion(view)
    if (fromV > toV) throw new IllegalStateException(
      s"view watermark v$fromV is ahead of source head v$toV — the " +
        "source was restored or recreated; drop and rebuild the view")
    if (fromV == toV) None else Some((fromV, toV))
  }

  /** Incremental refresh for ADDITIVE measures: each `(name, expr)`
    * maintains `sum(expr)` per group (plus [[CountCol]]); `avg` is
    * sum/count at read time. Creates the view on first call (full
    * fold of the feed from v0 — the same code path, not a special
    * case). Sum expressions should be exact types (integral/decimal):
    * a float sum folds associatively but not bit-reproducibly. */
  def refreshAdditive(src: SnapshotTable, view: SnapshotTable,
                      keys: Seq[String],
                      sums: Seq[(String, Column)]): Unit = {
    require(keys.nonEmpty, "refreshAdditive needs at least one group key")
    val (fromV, toV) = span(src, view).getOrElse(return)
    commitMerged(view, keys, sums.map(_._1),
      foldAdditive(src.changesDelta(fromV, toV), keys, sums), toV,
      additive = true)
  }

  /** Fold a frame of before/after IMAGES into per-group signed deltas
    * keyed by [[KeyCol]] — the shared core of the batch refresh and
    * the streaming maintainer ([[graft.streaming.StreamingView]]).
    * Uncanceled rewrite pairs (the streaming feed's raw algebra) — a
    * row delivered as one `before` plus one `after` — cancel here by
    * construction. */
  private[graft] def foldAdditive(images: DataFrame, keys: Seq[String],
                                  sums: Seq[(String, Column)]): DataFrame = {
    val img = col(SnapshotTable.ImageCol)
    val sign = when(img === "before", lit(-1L)).otherwise(lit(1L))
    // NULL measure values fold as 0 on both images — the explicit form
    // of SQL sum's null-skipping, symmetric between add and subtract
    val aggCols =
      sums.map { case (n, e) =>
        sum(sign * when(e.isNull, lit(0L)).otherwise(e)).as(n)
      } :+ sum(sign).as(CountCol)
    images
      .groupBy(keys.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
      // rewrite-only churn (compaction, carried files) folds to ZERO
      // net change — skip those groups entirely, so a pure compact of
      // the source touches nothing in the view
      .filter(sums.map(s => col(s._1) =!= 0L)
        .foldLeft(col(CountCol) =!= 0L)(_ || _))
      .withColumn(KeyCol, keyExpr(keys))
  }

  /** Incremental refresh for ARBITRARY aggregates: `aggs` are complete
    * aggregate expressions (min/max/count_distinct/…). The change feed
    * supplies only the DIRTY group keys; those groups are recomputed
    * from the CURRENT source, scoped to the dirty keys by a broadcast
    * null-safe semi-join (a source clustered by the group key prunes
    * the scan to the touched files). Groups with no remaining source
    * rows are deleted from the view. */
  def refreshRecompute(src: SnapshotTable, view: SnapshotTable,
                       keys: Seq[String],
                       aggs: Seq[(String, Column)]): Unit = {
    require(keys.nonEmpty, "refreshRecompute needs at least one group key")
    val (fromV, toV) = span(src, view).getOrElse(return)
    val dirty = src.changesDelta(fromV, toV)
      .select(keys.map(col): _*).distinct()
    // pin the recompute to toV: group values and watermark must
    // describe the SAME source state even if a commit lands mid-plan
    recomputeDirty(view, src.readVersion(toV), dirty, keys, aggs, toV)
  }

  /** Recompute exactly the `dirty` groups from `source` and merge
    * them (upserting changed groups, deleting vanished ones) with the
    * watermark `toV` — the shared dirty-group core of the batch
    * refresh and the streaming maintainer. `source` must be the
    * snapshot AT `toV`. */
  private[graft] def recomputeDirty(view: SnapshotTable,
                                    source: DataFrame, dirty0: DataFrame,
                                    keys: Seq[String],
                                    aggs: Seq[(String, Column)],
                                    toV: Long): Unit = {
    // the dirty set is consumed three times (emptiness probe, the
    // semi-join, the delete-detection join) and is O(changed groups)
    // small — cache it so the feed/net-fold plan runs once
    val dirty = dirty0.persist()
    try {
      if (dirty.isEmpty) {
        // rewrite-only churn: NO group changed — the watermark still
        // must advance past the span, but as pure metadata, without a
        // source scan to discover the emptiness downstream
        advanceWatermark(view, toV)
        return
      }
      // null-safe equality: a NULL group key is a real group and must
      // stay refreshable (a plain join would silently drop it forever)
      val cond = keys.map(k => source(k) <=> dirty(k)).reduce(_ && _)
      val aggCols = aggs.map { case (n, e) => e.as(n) } :+
        count(lit(1L)).as(CountCol)
      val fresh = source.join(broadcast(dirty), cond, "left_semi")
        .groupBy(keys.map(col): _*)
        .agg(aggCols.head, aggCols.tail: _*)
        .withColumn(KeyCol, keyExpr(keys))
      // a dirty key absent from `fresh` lost its last row: delete it.
      // Left-outer FROM the dirty keys, broadcasting `fresh`: both
      // sides are O(changed groups), but only the non-preserved (right)
      // side of a left-outer join is broadcast-buildable — a broadcast
      // hint on the preserved side of an outer join is silently ignored
      // and falls back to a shuffle.
      val dirtyKeyed = dirty.withColumn(KeyCol, keyExpr(keys))
      val out = dirtyKeyed.select(KeyCol)
        .join(broadcast(fresh), Seq(KeyCol), "left_outer")
        .withColumn(CountCol, coalesce(col(CountCol), lit(0L)))
      commitMerged(view, keys, aggs.map(_._1),
        // deleted groups surface with NULL key/measure columns (KeyCol,
        // the preserved left side, is never null); the delete path only
        // needs KeyCol, and conformToSchema casts the nulls
        out, toV, additive = false)
    } finally dirty.unpersist()
  }

  /** Advance the view's watermark (and key-format stamp) as a
    * METADATA-ONLY commit — the no-group-changed refresh outcome. */
  private def advanceWatermark(view: SnapshotTable, toV: Long): Unit =
    view.setProperties(Map(SourceVersionProp -> toV.toString,
      KeyFormatProp -> KeyFormat))

  // ---- persisted definitions: the SQL-driven refresh loop ----------

  /** Definition properties logged on the view by [[defineAdditive]] /
    * [[defineRecompute]] — enough to re-derive the whole refresh from
    * the view alone, which is what lets `CALL
    * graft.system.refresh_mv('ns.view')` run with no Scala in the
    * loop. The format is plain TBLPROPERTIES, so a view can equally
    * be DEFINED in pure SQL: `CREATE TABLE … TBLPROPERTIES
    * ('graft.mv.source' = '<path>', 'graft.mv.mode' = 'additive',
    * 'graft.mv.keys' = 'k1,k2',
    * 'graft.mv.measure.revenue' = '<expr sql>')` — one property per
    * measure, keyed by its output column name. */
  val SourceProp = "graft.mv.source"
  val ModeProp = "graft.mv.mode"
  val KeysProp = "graft.mv.keys"
  val MeasurePrefix = "graft.mv.measure."

  private def defProps(src: SnapshotTable, mode: String,
                       keys: Seq[String],
                       measures: Seq[(String, String)]): Map[String, String] =
    Map(SourceProp -> src.path, ModeProp -> mode,
      KeysProp -> keys.mkString(",")) ++
      measures.map { case (n, sql) => s"$MeasurePrefix$n" -> sql }

  /** [[refreshAdditive]] with measures as SQL EXPRESSION STRINGS, and
    * the whole definition (source path, mode, keys, measures) staged
    * onto the view's first commit — after this, anyone (including the
    * `refresh_mv` procedure, i.e. pure SQL) can refresh the view
    * without knowing its definition. */
  def defineAdditive(src: SnapshotTable, view: SnapshotTable,
                     keys: Seq[String],
                     sums: Seq[(String, String)]): Unit = {
    view.stageProperties(defProps(src, "additive", keys, sums))
    refreshAdditive(src, view, keys,
      sums.map { case (n, s) => (n, expr(s)) })
    persistDefinitionIfUncommitted(view, defProps(src, "additive", keys, sums))
  }

  /** [[refreshRecompute]]'s definition form — measures are SQL
    * AGGREGATE expression strings. */
  def defineRecompute(src: SnapshotTable, view: SnapshotTable,
                      keys: Seq[String],
                      aggs: Seq[(String, String)]): Unit = {
    view.stageProperties(defProps(src, "recompute", keys, aggs))
    refreshRecompute(src, view, keys,
      aggs.map { case (n, s) => (n, expr(s)) })
    persistDefinitionIfUncommitted(view, defProps(src, "recompute", keys, aggs))
  }

  /** The refresh inside define* may be a NO-OP (view already current
    * with its source), in which case nothing committed and the staged
    * definition would be silently lost with the handle — a later
    * `refresh_mv` would then refuse the "defined" view. Persist it as
    * a metadata-only commit in that case. */
  private def persistDefinitionIfUncommitted(
      view: SnapshotTable, props: Map[String, String]): Unit =
    if (view.exists && !view.properties.contains(ModeProp))
      view.setProperties(props)

  /** A view's logged definition, decoded: (source handle, mode, group
    * keys, measures as Columns). ONE parser — and one set of
    * corruption-class guards (everything throws IllegalStateException
    * with the operational fact) — for the batch refresh AND the
    * streaming maintainer. */
  private[graft] def definitionOf(view: SnapshotTable)
      : (SnapshotTable, String, Seq[String], Seq[(String, Column)]) = {
    require(view.exists, s"no materialized view at ${view.path}")
    val props = view.properties
    def need(k: String): String = props.getOrElse(k,
      throw new IllegalStateException(
        s"view at ${view.path} logs no $k — not a DEFINED materialized " +
          "view (create it through defineAdditive/defineRecompute)"))
    val src = SnapshotTable(view.session, need(SourceProp),
      "_unused_read_only")
    if (!src.exists) throw new IllegalStateException(
      s"materialized-view source ${need(SourceProp)} no longer exists")
    val keys = need(KeysProp).split(",", -1).toSeq
      .map(_.trim).filter(_.nonEmpty)
    if (keys.isEmpty) throw new IllegalStateException(
      s"view at ${view.path} logs an empty $KeysProp — a definition " +
        "needs at least one group key")
    // one property per measure; alphabetical by output name so the
    // derived column order is deterministic (the merge conforms by
    // NAME, so order never affects results)
    val measures = props.toSeq
      .collect { case (k, sql) if k.startsWith(MeasurePrefix) =>
        (k.stripPrefix(MeasurePrefix), expr(sql))
      }.sortBy(_._1)
    if (measures.isEmpty) throw new IllegalStateException(
      s"view at ${view.path} logs no $MeasurePrefix* measures")
    val mode = need(ModeProp)
    if (mode != "additive" && mode != "recompute")
      throw new IllegalStateException(
        s"unknown materialized-view mode '$mode' at ${view.path}")
    (src, mode, keys, measures)
  }

  /** Refresh a view from its LOGGED definition alone (the
    * `refresh_mv` procedure's engine): resolve the source, mode, keys
    * and measure SQL from the view's properties and dispatch to the
    * right refresh. Fails loudly on a view that carries no
    * definition. */
  def refreshByDefinition(view: SnapshotTable): Unit = {
    val (src, mode, keys, measures) = definitionOf(view)
    mode match {
      case "additive" => refreshAdditive(src, view, keys, measures)
      case "recompute" => refreshRecompute(src, view, keys, measures)
    }
  }

  /** Merge refresh output into the view in ONE commit: upsert live
    * groups, delete emptied ones, stage the watermark. For the
    * additive path the incoming measures are DELTAS to fold onto the
    * current group values; for recompute they are final values. */
  private[graft] def commitMerged(view: SnapshotTable, keys: Seq[String],
                           measures: Seq[String], incoming0: DataFrame,
                           toV: Long, additive: Boolean): Unit = {
    // the delta is consumed at least twice (the emptiness probe plus
    // the merge — an aggregate plan re-executes in full under
    // isEmpty's limit(1), so the probe is NOT free on the raw frame)
    // and is O(changed groups) small: cache it for the duration
    val incoming = incoming0.persist()
    try {
      // NO group changed (rewrite-only source churn — compaction,
      // clustering): advance the watermark as a METADATA-ONLY commit
      if (view.exists && incoming.isEmpty) {
        advanceWatermark(view, toV)
        return
      }
      val merged =
        if (!additive || !view.exists) incoming
        else {
          // old values for exactly the touched groups: semi-join
          // prunes the view scan to O(changed groups) rows BEFORE the
          // small broadcast outer join folds them — never a broadcast
          // of the view, never a shuffle of it either
          val old = view.read
            .join(broadcast(incoming.select(KeyCol)), Seq(KeyCol),
              "left_semi")
            .select(col(KeyCol) +:
              (measures :+ CountCol).map(m => col(m).as(s"__old_$m")): _*)
          incoming.join(broadcast(old), Seq(KeyCol), "left_outer")
            .select(col(KeyCol) +: keys.map(col) ++:
              (measures :+ CountCol).map(m =>
                (coalesce(col(s"__old_$m"), lit(0L)) + col(m)).as(m)): _*)
        }
      val guarded = merged.withColumn(CountCol,
        when(col(CountCol) < 0L, raise_error(concat(lit(
          "materialized view fold went negative for group key "),
          col(KeyCol), lit(" — source feed and view state disagree"))))
          .otherwise(col(CountCol)))
      val out = guarded
        .withColumn(DropCol, col(CountCol) === 0L)
        .select(col(KeyCol) +: keys.map(col) ++:
          (measures :+ CountCol).map(col) :+ col(DropCol): _*)
      view.stageProperties(Map(SourceVersionProp -> toV.toString,
        KeyFormatProp -> KeyFormat))
      if (!view.exists) {
        view.create(out.filter(!col(DropCol)).drop(DropCol))
      } else view.upsertDelete(out, DropCol)
    } finally incoming.unpersist()
  }
}
