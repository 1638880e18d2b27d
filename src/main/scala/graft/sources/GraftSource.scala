package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.plans.SnapshotTable

/** `spark.read.format("graft")` — the snapshot table as a registered
  * Spark data source:
  *
  * {{{
  *   spark.read.format("graft").load(path)                    // head
  *   spark.read.format("graft")
  *     .option("versionAsOf", 3).load(path)                   // travel
  *   ...load(path).where($"k" between (lo, hi))               // skips
  * }}}
  *
  * READS resolve through the DataSource V2 [[TableProvider]] interface
  * to a [[GraftTable]]: Spark's own vectorized parquet `BatchScan`
  * planned over the snapshot manifest (zero listings, planning-time
  * partition pruning + min/max skipping, whole-stage codegen intact).
  *
  * WRITES keep the V1 [[CreatableRelationProvider]] path on purpose:
  * the V2 `save()` contract forbids ErrorIfExists/Ignore, while the
  * table's save-mode matrix maps all four modes onto atomic snapshot
  * commits. [[GraftTable]] therefore declares no BATCH_WRITE
  * capability, which makes `DataFrameWriter.save` fall back to exactly
  * this V1 path — both halves stay reachable by one `format("graft")`. */
class GraftSource extends RelationProvider with CreatableRelationProvider
    with DataSourceRegister with TableProvider {

  override def shortName(): String = "graft"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft source requires a path: .load/.save(<table dir>)"))

  /** versionAsOf/timestampAsOf/tagAsOf options → the pinned snapshot
    * version. Timestamps (epoch millis, or an ISO date/datetime
    * literal interpreted in the SESSION time zone — the zone SQL
    * literals mean, not the JVM default) and tag names resolve once,
    * so relations stay version-pinned. With the `branch` option, ALL
    * pins resolve against the BRANCH's commit line — versions are
    * branch-local, commit times are the branch records' mtimes, and
    * tag namespaces are per line (a tag created through a branch
    * handle lives in that branch's log) — resolving a MAIN tag or
    * timestamp and pinning the number onto a different line would
    * silently read an arbitrary snapshot. */
  private def resolveVersion(spark: SparkSession, path: String,
                             parameters: Map[String, String]): Option[Long] = {
    val pins = Seq("versionAsOf", "timestampAsOf", "tagAsOf")
      .filter(k => GraftSource.optCI(parameters, k).isDefined)
    require(pins.lengthIs <= 1,
      s"set at most one of versionAsOf/timestampAsOf/tagAsOf, " +
        s"got ${pins.mkString(", ")}")
    def handle = SnapshotTable(spark, path, "_unused_read_only",
      branch = GraftSource.optCI(parameters, "branch"))
    GraftSource.optCI(parameters, "versionAsOf").map(_.toLong).orElse(
      GraftSource.optCI(parameters, "timestampAsOf").map { raw =>
        val ms = GraftSource.sessionEpochMs(spark, raw)
        handle.versionAt(ms).getOrElse(throw new IllegalArgumentException(
          s"no snapshot at $path existed at timestampAsOf=$raw"))
      }).orElse(
      GraftSource.optCI(parameters, "tagAsOf").map { name =>
        handle.versionOfTag(name).getOrElse(
          throw new IllegalArgumentException(s"no tag '$name' at $path"))
      })
  }

  // ---- DataSource V2 read half: TableProvider → GraftTable

  // one table per resolution sequence: Spark calls inferSchema,
  // inferPartitioning and getTable back-to-back on one provider
  // instance, and each GraftTable construction reads the manifest —
  // memoizing by options cuts three metadata reads to one. The session
  // time zone is part of the key: an ISO `timestampAsOf` literal means
  // a different instant under a different session zone, so a zone
  // change must re-resolve rather than reuse the cached version pin.
  @volatile private var lastTable: ((Map[String, String], String), Table) = null

  private def makeTable(options: Map[String, String]): Table = {
    val spark = SparkSession.active
    val key = (options, spark.sessionState.conf.sessionLocalTimeZone)
    val cached = lastTable
    if (cached != null && cached._1 == key) return cached._2
    val path = pathOf(options)
    val main = SnapshotTable(spark, path, "_unused_read_only")
    // a mistyped branch name must say so — without this check the
    // branch handle's empty log surfaces as "no committed snapshot at
    // <path>", telling the user an EXISTING table doesn't exist
    GraftSource.optCI(options, "branch").foreach { b =>
      if (main.exists &&
          !SnapshotTable(spark, path, "_unused_read_only",
            branch = Some(b)).exists)
        throw new IllegalArgumentException(
          s"no branch '$b' at $path" + (main.branches match {
            case Nil => " (the table has no branches)"
            case bs => s" (have: ${bs.mkString(", ")})"
          }))
    }
    val t =
      if (!main.exists) new MissingGraftTable(path)
      else new GraftTable(spark, path, resolveVersion(spark, path, options),
        options)
    lastTable = (key, t)
    t
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    import scala.jdk.CollectionConverters._
    makeTable(options.asCaseSensitiveMap.asScala.toMap).schema()
  }

  override def inferPartitioning(options: CaseInsensitiveStringMap)
      : Array[Transform] = {
    import scala.jdk.CollectionConverters._
    makeTable(options.asCaseSensitiveMap.asScala.toMap).partitioning()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    import scala.jdk.CollectionConverters._
    makeTable(properties.asScala.toMap)
  }

  // ---- V1 read half kept only for code paths that explicitly ask for
  // a BaseRelation (none in Spark's own resolution once TableProvider
  // exists; SQL `USING graft` and INSERT INTO ride it — see below)

  override def createRelation(
      ctx: SQLContext, parameters: Map[String, String]): BaseRelation = {
    val path = pathOf(parameters)
    require(!parameters.contains("branch"),
      s"the V1 relation of $path cannot serve a branch — read branches " +
        "through spark.read.format(\"graft\").option(\"branch\", ...) " +
        "or the SnapshotTable API")
    val asOf = resolveVersion(ctx.sparkSession, path, parameters)
    SnapshotRelation(ctx, path, asOf, parameters)
  }

  /** Sink side — `df.write.format("graft")`: every SaveMode maps onto
    * an ATOMIC snapshot commit. Append MERGEs by the merge key when one
    * is known — the `primaryKey` option, or the table property a
    * catalog-created table logs in its manifest — and is a standard
    * BLIND append otherwise (duplicate keys kept, O(batch) I/O, the
    * Delta `append` semantic); Overwrite commits a fresh version whose
    * manifest lists only the new data, with history retained for time
    * travel; ErrorIfExists/Ignore follow their contracts against table
    * existence. `partitionCol` opts into partition-scoped rewrites. */
  override def createRelation(
      ctx: SQLContext, mode: org.apache.spark.sql.SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame): BaseRelation = {
    val path = pathOf(parameters)
    require(!parameters.contains("branch"),
      s"cannot write a branch of $path through the save() sink — " +
        "branch writes go through the SnapshotTable API (forBranch)")
    val pkOpt = parameters.get("primaryKey").orElse(
      SnapshotTable(ctx.sparkSession, path, "_unused_read_only")
        .properties.get("primaryKey"))
    val table = SnapshotTable(ctx.sparkSession, path,
      pkOpt.getOrElse("_unused_no_merge_key"),
      partitionCol = parameters.get("partitionCol"))
    import org.apache.spark.sql.SaveMode._
    mode match {
      case ErrorIfExists if table.exists =>
        throw new IllegalStateException(s"table already exists at $path")
      case Ignore if table.exists => ()
      case ErrorIfExists | Ignore => table.create(data)
      case Append if pkOpt.isDefined => table.upsert(data)
      case Append => table.append(data)
      case Overwrite
        if parameters.get("partitionOverwriteMode")
          .exists(_.equalsIgnoreCase("dynamic")) && table.exists =>
        // Spark's dynamic-overwrite contract: replace exactly the
        // partitions the batch carries, keep the rest by reference
        table.replacePartitions(data)
      case Overwrite =>
        // an atomic full replace: commit a version containing ONLY the
        // new data (prior versions stay time-travelable until vacuum)
        if (table.exists) table.replace(data) else table.create(data)
    }
    SnapshotRelation(ctx, path, None, parameters)
  }
}

case class SnapshotRelation(ctx: SQLContext, path: String,
                            version: Option[Long],
                            parameters: Map[String, String] = Map.empty)
    extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  // read-only handle: the primary key only matters for writes. The
  // catalog's branch identifier (`t$branch_<name>`) rides in as the
  // `branch` option — this relation then serves the BRANCH line (its
  // INSERT commits there; scans through the DSv2 path already do).
  private def branchOf: Option[String] =
    GraftSource.optCI(parameters, "branch")
  private def table =
    SnapshotTable(ctx.sparkSession, path, primaryKey = "_unused_read_only",
      branch = branchOf)

  override def sqlContext: SQLContext = ctx

  override lazy val schema: StructType =
    version.fold(table.read)(table.readVersion).schema

  /** Manifest [lo, hi] bounds from the pushed filters
    * ([[FilterPruning.pruneBounds]] — shared with the row-level scan). */
  private def pruneBounds(filters: Array[Filter]): Seq[(String, Any, Any)] =
    FilterPruning.pruneBounds(filters)

  // every filter is re-applied by Spark on top of the scan: pruning
  // may only skip files, never rows
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters

  /** SQL DML — `INSERT INTO` a graft table. With a `primaryKey`
    * (CREATE TABLE OPTIONS, or the table property the catalog
    * persists in the manifest) the insert MERGEs by that key — the
    * graft Append semantic; WITHOUT one it is a standard blind append
    * (duplicate keys kept, O(batch) I/O, no merge join). `INSERT
    * OVERWRITE` is an atomic full replace with history retained. */
  override def insert(data: org.apache.spark.sql.DataFrame,
                      overwrite: Boolean): Unit = {
    require(version.isEmpty, "cannot INSERT into a versionAsOf read")
    // the OPTIONS key wins; a catalog table carries it as a logged
    // table property instead
    val t0 = table
    val pk = parameters.get("primaryKey")
      .orElse(t0.properties.get("primaryKey"))
    val t = SnapshotTable(ctx.sparkSession, path,
      pk.getOrElse("_unused_no_merge_key"),
      partitionCol = parameters.get("partitionCol"),
      branch = branchOf)
    // INSERT OVERWRITE honors partitionOverwriteMode=dynamic exactly
    // like the save() path: replace only the batch's partitions, keep
    // the rest by reference — without this the two entry points
    // diverged, and SQL overwrite silently wiped untouched partitions
    // on a table configured for dynamic overwrite
    val dynamic = parameters.get("partitionOverwriteMode")
      .exists(_.equalsIgnoreCase("dynamic"))
    if (overwrite) {
      if (!t.exists) t.create(data)
      else if (dynamic) t.replacePartitions(data)
      else t.replace(data)
    }
    else if (pk.isDefined) t.upsert(data)
    else t.append(data)
  }

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val bounds = pruneBounds(filters)
    val base = version match {
      case Some(v) => table.readVersion(v) // travel reads skip pruning:
      // candidateFiles prunes the CURRENT manifest only, and pruning
      // against the wrong version's stats could be wrong, not just slow
      case None if bounds.nonEmpty => table.readWhere(bounds: _*)
      case None => table.read
    }
    // exactly the requested columns — count(*) asks for NONE, and the
    // row converter reads fields positionally against the pruned schema
    base.select(requiredColumns.toIndexedSeq.map(col): _*).rdd
  }
}

private[sources] object GraftSource {

  /** Case-INSENSITIVE option lookup: the V2 TableProvider path hands
    * us `asCaseSensitiveMap` (original key spellings), while Spark's
    * own option handling — and the V1 `CaseInsensitiveMap` parameters
    * — treat keys case-insensitively. A case-sensitive get here meant
    * `option("BRANCH", ...)` silently read/wrote MAIN: the exact
    * silent-wrong-table class the branch write guard exists for. */
  def optCI(parameters: Map[String, String], key: String): Option[String] =
    parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase(key) => v
    }

  /** An epoch-millis literal, or an ISO date/datetime interpreted in
    * the SESSION time zone — the zone SQL literals mean, not the JVM
    * default. Shared by batch `timestampAsOf` and the streaming
    * source's `startingTimestamp`. */
  def sessionEpochMs(spark: SparkSession, raw: String): Long =
    raw.toLongOption.getOrElse {
      val zone = java.time.ZoneId.of(
        spark.sessionState.conf.sessionLocalTimeZone)
      val ldt =
        if (raw.length == 10)
          java.time.LocalDate.parse(raw).atStartOfDay()
        else java.time.LocalDateTime.parse(raw.replace(' ', 'T'))
      ldt.atZone(zone).toInstant.toEpochMilli
    }
}
