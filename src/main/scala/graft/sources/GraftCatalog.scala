package graft.sources

import java.util.Collections

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{
  NamespaceAlreadyExistsException, NoSuchNamespaceException,
  NoSuchTableException, NonEmptyNamespaceException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{
  CatalogPlugin, Identifier, NamespaceChange, ProcedureCatalog,
  SupportsNamespaces, Table, TableCatalog, TableCatalogCapability,
  TableChange}
import org.apache.spark.sql.connector.catalog.procedures.{
  BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{
  DataTypes, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.SnapshotTable

/** A DataSource V2 catalog over a warehouse of graft snapshot tables —
  * the lakehouse surface a SQL-only user drives end to end:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     "graft.sources.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/wh")
  *
  *   CREATE NAMESPACE graft.sales
  *   CREATE TABLE graft.sales.orders (id BIGINT, status STRING, ...)
  *     PARTITIONED BY (status) TBLPROPERTIES ('primaryKey' = 'id')
  *   INSERT INTO graft.sales.orders ...        -- MERGEs by primaryKey
  *   MERGE INTO graft.sales.orders ...         -- row-level operations
  *   SELECT * FROM graft.sales.orders VERSION AS OF 1   -- time travel
  *   ALTER TABLE graft.sales.orders ADD COLUMNS (note STRING)
  *   CALL graft.system.compact(table => 'sales.orders')
  * }}}
  *
  * Table layout: `<warehouse>/<namespace dirs...>/<table>` — a table
  * dir is one with a `_commits` manifest log; every other dir is a
  * namespace. All table metadata (schema, partition columns, CHECK
  * constraints, properties) lives in the table's own manifest, so the
  * catalog itself is stateless: any handle — this catalog,
  * `format("graft")`, a bare [[SnapshotTable]] — sees the same table.
  *
  * Maintenance runs through SQL `CALL` ([[ProcedureCatalog]]):
  * `graft.system.{vacuum, compact, restore, history}`.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  /** DEFAULT-valued columns are accepted in DDL (`CREATE TABLE (c INT
    * DEFAULT 5)`, `ALTER TABLE ADD COLUMN c INT DEFAULT 5`): the
    * analyzer folds the default and this catalog stores it in the
    * field's metadata under Spark's own keys, where the parquet
    * readers (file-missing columns) and INSERT resolution already
    * consume it — see [[graft.plans.SnapshotTable.addColumn]]. */
  override def capabilities(): java.util.Set[TableCatalogCapability] =
    java.util.EnumSet.of(TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  private def spark: SparkSession = SparkSession.active

  // resolved once: the warehouse never changes after initialize, and a
  // per-probe newHadoopConf() clone would tax every metadata operation
  private lazy val fs: FileSystem = new Path(warehouse)
    .getFileSystem(spark.sessionState.newHadoopConf())

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  // ---- layout --------------------------------------------------------

  private def nsPath(namespace: Array[String]): Path =
    new Path((warehouse +: namespace.toSeq).mkString("/"))

  private def tablePath(ident: Identifier): String =
    ((warehouse +: ident.namespace.toSeq) :+ ident.name).mkString("/")

  private def isTableDir(p: Path): Boolean =
    fs.exists(new Path(p, "_commits"))

  private def snapshotAt(ident: Identifier): SnapshotTable =
    SnapshotTable(spark, tablePath(ident), "_unused_read_only")

  // ---- TableCatalog --------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsPath(namespace)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      .filter(isTableDir)
      .map(p => Identifier.of(namespace, p.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    snapshotAt(ident).exists

  /** Resolve an identifier that may carry the Iceberg-style BRANCH
    * suffix (`ns`.`t$branch_dev` — SQL has no branch syntax of its
    * own) into (base identifier, the snapshot handle to resolve
    * versions/tags against — the BRANCH line's when suffixed — and the
    * branch option map entry). Shared by ALL loadTable overloads: time
    * travel on a branch identifier must resolve, and resolve
    * branch-locally. Resolution order keeps plain tables
    * authoritative: the suffix only fires when no table of the literal
    * name exists. */
  private def resolveIdent(ident: Identifier)
      : (Identifier, SnapshotTable, Map[String, String]) = {
    ident.name.split("\\$branch_", 2) match {
      case Array(base, b) if b.nonEmpty && !snapshotAt(ident).exists =>
        val baseIdent = Identifier.of(ident.namespace, base)
        val snap = snapshotAt(baseIdent)
        if (!snap.exists) throw new NoSuchTableException(ident)
        if (!snap.forBranch(b).exists)
          throw new IllegalArgumentException(
            s"no branch '$b' of $baseIdent" + (snap.branches match {
              case Nil => " (the table has no branches)"
              case bs => s" (have: ${bs.mkString(", ")})"
            }))
        (baseIdent, snap.forBranch(b), Map("branch" -> b))
      case _ =>
        val snap = snapshotAt(ident)
        if (!snap.exists) throw new NoSuchTableException(ident)
        (ident, snap, Map.empty)
    }
  }

  override def loadTable(ident: Identifier): Table = {
    val (baseIdent, line, branchProp) = resolveIdent(ident)
    // the logged properties ride along as the table's options so the
    // write path knows its merge key without re-reading the manifest
    new GraftTable(spark, tablePath(baseIdent), None,
      line.properties ++ branchProp)
  }

  /** SQL `VERSION AS OF <v>`: a handle pinned to one manifest. A
    * non-numeric version resolves as a TAG name (Iceberg's
    * `VERSION AS OF 'tag'` contract). On a branch identifier both the
    * version sequence and the tag namespace are the BRANCH's. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val (baseIdent, line, branchProp) = resolveIdent(ident)
    val v = version.toLongOption
      .orElse(line.versionOfTag(version))
      .getOrElse(throw new IllegalArgumentException(
        s"'$version' is neither a numeric manifest id nor a tag of $ident"))
    // fail resolution with the operational fact, not a scan-time
    // FileNotFoundException (the timestamp overload below already does)
    if (!line.hasVersion(v)) throw new IllegalArgumentException(
      s"no retained snapshot v$v of $ident — never committed or vacuumed")
    new GraftTable(spark, tablePath(baseIdent), Some(v),
      line.properties ++ branchProp)
  }

  /** SQL `TIMESTAMP AS OF <t>` — Spark hands the instant as MICROsecond
    * epoch; resolve it against manifest commit times once, so the
    * relation stays version-pinned for its lifetime. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val (baseIdent, line, branchProp) = resolveIdent(ident)
    val v = line.versionAt(Math.floorDiv(timestampMicros, 1000L)).getOrElse(
      throw new IllegalArgumentException(
        s"no snapshot of ${ident} existed at timestamp $timestampMicros"))
    new GraftTable(spark, tablePath(baseIdent), Some(v),
      line.properties ++ branchProp)
  }

  /** Reserved keys Spark routes through `properties` that are not table
    * metadata of ours. */
  private val ReservedProps = Set(
    TableCatalog.PROP_PROVIDER, TableCatalog.PROP_LOCATION,
    TableCatalog.PROP_OWNER, TableCatalog.PROP_EXTERNAL,
    TableCatalog.PROP_COMMENT, TableCatalog.PROP_COLLATION,
    TableCatalog.PROP_TABLE_TYPE, TableCatalog.PROP_IS_MANAGED_LOCATION)

  /** CREATE TABLE OPTIONS arrive `option.`-prefixed, TBLPROPERTIES
    * bare; normalize both into the bare property map the manifest logs
    * (bare wins on collision). */
  private def normalizeProps(
      properties: java.util.Map[String, String]): Map[String, String] = {
    val all = properties.asScala.toMap
    val fromOptions = all.collect {
      case (k, v) if k.startsWith(TableCatalog.OPTION_PREFIX) =>
        k.stripPrefix(TableCatalog.OPTION_PREFIX) -> v
    }
    (fromOptions ++ all.filterNot(_._1.startsWith(TableCatalog.OPTION_PREFIX)))
      .filterNot { case (k, _) => ReservedProps.contains(k) }
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val partCols = partitions.toSeq.map {
      case t if t.name == "identity" && t.references.length == 1 =>
        t.references.head.fieldNames.mkString(".")
      case t => throw new UnsupportedOperationException(
        s"graft tables partition by identity columns only, got $t")
    }
    partCols.foreach(c => require(schema.fieldNames.contains(c),
      s"partition column '$c' not in table schema"))
    val props = normalizeProps(properties)
    // fail the typo at CREATE, not deep in the first INSERT's anti-join
    props.get("primaryKey").foreach(pk =>
      require(schema.fieldNames.contains(pk),
        s"primaryKey '$pk' not in table schema"))
    // a SQL-declared materialized view (graft.mv.* TBLPROPERTIES) must
    // fail a malformed definition HERE, with the DDL statement — not at
    // the first CALL refresh_mv, far from the typo
    graft.plans.MaterializedAgg.validateDefinitionProps(spark, props)
    // TBLPROPERTIES('clusterBy' = 'c1,c2'[, 'clusterFiles' = 'n'])
    // declares the range-clustered flat layout from SQL (the shape a
    // materialized view wants: stats-scoped merges on its key). The
    // layout is logged in the create manifest, so every later writer
    // — whatever handle — clusters and stats the same way.
    val clusterCols = props.get("clusterBy")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Nil)
    clusterCols.foreach(c => require(schema.fieldNames.contains(c),
      s"clusterBy column '$c' not in table schema"))
    require(clusterCols.isEmpty || partCols.isEmpty,
      "clusterBy is the flat-layout alternative to PARTITIONED BY — " +
        "declare one or the other")
    // fail the typo at CREATE (same stance as primaryKey above): a
    // silently-zero clusterFiles would leave file sizing to AQE and
    // quietly degrade the very merge scoping the layout declares
    props.get("clusterFiles").foreach(v =>
      require(v.toIntOption.exists(_ >= 0),
        s"clusterFiles must be a non-negative integer, got '$v'"))
    fs.mkdirs(nsPath(ident.namespace))
    SnapshotTable(spark, tablePath(ident),
      props.getOrElse("primaryKey", "_unused_no_merge_key"),
      partitionCols = partCols,
      statsCols = clusterCols,
      clusterBy = clusterCols,
      clusterFiles = props.get("clusterFiles")
        .flatMap(_.toIntOption).getOrElse(0),
      tableProps = props)
      .createEmpty(schema)
    loadTable(ident)
  }

  /** ALTER TABLE — SET/UNSET TBLPROPERTIES, ADD COLUMNS, ALTER COLUMN
    * TYPE (safe widenings only: int→long, float→double, …), and (on
    * column-id-mapped tables, TBLPROPERTIES 'graft.columnMapping'='id'
    * at create) RENAME/DROP COLUMN all map onto metadata-only manifest
    * commits; anything that would reinterpret committed bytes (type
    * narrowing or cross-family changes, rename/drop without id
    * mapping) is rejected. */
  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    val snap = snapshotAt(ident)
    if (!snap.exists) throw new NoSuchTableException(ident)
    // TWO passes: the first only COLLECTS (and rejects unsupported
    // shapes), the second commits — and the whole column-op sequence
    // is DRY-RUN against the evolving schema
    // (SnapshotTable.validateAlterSequence) before the first commit,
    // so a mixed ALTER whose later change is invalid leaves the table
    // untouched. Each op then still commits individually (one manifest
    // version per change, like consecutive single-change ALTERs).
    val sets = scala.collection.mutable.Map.empty[String, String]
    val unsets = scala.collection.mutable.Buffer.empty[String]
    val adds = scala.collection.mutable.Buffer.empty[StructField]
    val defaultOps =
      scala.collection.mutable.Buffer.empty[(String, Option[String])]
    val columnOps =
      scala.collection.mutable.Buffer.empty[graft.plans.SnapshotTable.ColumnAlter]
    changes.foreach {
      case s: TableChange.SetProperty =>
        sets += s.property -> s.value
      case r: TableChange.RemoveProperty =>
        unsets += r.property
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          "graft schema evolution adds top-level columns only")
        // reject rather than silently rewrite the user's DDL: the
        // manifest deliberately relaxes nullability at commit (readers
        // plan scans without opening footers), so a NOT NULL add could
        // not be enforced — even with a DEFAULT backing old rows
        if (!a.isNullable) throw new UnsupportedOperationException(
          s"added column '${a.fieldNames.head}' must be nullable — " +
            "graft manifests do not retain NOT NULL (add it nullable, " +
            "optionally with a DEFAULT)")
        if (a.position != null) throw new UnsupportedOperationException(
          "graft ADD COLUMNS appends at the end; FIRST/AFTER is not " +
            "supported")
        val base = StructField(a.fieldNames.head, a.dataType,
          nullable = true)
        // DEFAULT: the analyzer already folded it to a typed literal
        // (getValue) — store the original SQL as CURRENT_DEFAULT (what
        // future INSERTs resolve) and the frozen literal as
        // EXISTS_DEFAULT (what pre-add rows read)
        val f = Option(a.defaultValue()).fold(base) { d =>
          val lit = d.getValue
          if (lit == null) throw new UnsupportedOperationException(
            s"ADD COLUMN '${a.fieldNames.head}' DEFAULT must fold to a " +
              "literal")
          val frozen = org.apache.spark.sql.catalyst.expressions
            .Literal(lit.value, lit.dataType).sql
          base.copy(metadata = new org.apache.spark.sql.types
            .MetadataBuilder()
            .putString(graft.plans.SnapshotTable.CurrentDefaultKey,
              Option(d.getSql).getOrElse(frozen))
            .putString(graft.plans.SnapshotTable.ExistsDefaultKey, frozen)
            .build())
        }
        adds += Option(a.comment).fold(f)(f.withComment)
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          "graft renames top-level columns only")
        columnOps += graft.plans.SnapshotTable.RenameCol(
          r.fieldNames.head, r.newName)
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1,
          "graft drops top-level columns only")
        columnOps += graft.plans.SnapshotTable.DropCol(d.fieldNames.head)
      case u: TableChange.UpdateColumnDefaultValue =>
        require(u.fieldNames.length == 1,
          "graft alters top-level column defaults only")
        // "" is the parser's DROP DEFAULT; anything else is SET — only
        // the CURRENT default moves (the frozen initial default stays,
        // see SnapshotTable.setColumnDefault)
        defaultOps += (u.fieldNames.head ->
          Option(u.newDefaultValue()).filter(_.nonEmpty))
      case u: TableChange.UpdateColumnType =>
        require(u.fieldNames.length == 1,
          "graft widens top-level columns only")
        // metadata-only SAFE widening (int->long, float->double, ...);
        // widenColumn refuses anything that would reinterpret bytes
        columnOps += graft.plans.SnapshotTable.WidenCol(
          u.fieldNames.head, u.newDataType)
      case other => throw new UnsupportedOperationException(
        s"graft tables do not support ALTER change $other")
    }
    // an ALTER that touches a materialized-view definition validates
    // the MERGED property state, same fail-fast stance as CREATE
    if (sets.keys.exists(_.startsWith("graft.mv.")) ||
        unsets.exists(_.startsWith("graft.mv.")))
      graft.plans.MaterializedAgg.validateDefinitionProps(spark,
        snap.properties ++ sets -- unsets)
    if (columnOps.nonEmpty || adds.nonEmpty || defaultOps.nonEmpty)
      snap.validateAlterSequence(columnOps.toSeq, adds.toSeq,
        defaultOps.toSeq)
    columnOps.foreach {
      case graft.plans.SnapshotTable.RenameCol(o, n) => snap.renameColumn(o, n)
      case graft.plans.SnapshotTable.DropCol(n) => snap.dropColumn(n)
      case graft.plans.SnapshotTable.WidenCol(n, t) => snap.widenColumn(n, t)
    }
    defaultOps.foreach { case (n, d) => snap.setColumnDefault(n, d) }
    if (adds.nonEmpty)
      snap.evolveTo(StructType(snap.read.schema.fields ++ adds))
    if (sets.nonEmpty || unsets.nonEmpty)
      snap.setProperties(sets.toMap, unsets.toSeq)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    tableExists(ident) && fs.delete(new Path(tablePath(ident)), true)

  override def purgeTable(ident: Identifier): Boolean = dropTable(ident)

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    fs.mkdirs(nsPath(newIdent.namespace))
    if (!fs.rename(new Path(tablePath(oldIdent)),
                   new Path(tablePath(newIdent))))
      throw new IllegalStateException(
        s"rename ${oldIdent} -> ${newIdent} failed")
  }

  // ---- SupportsNamespaces --------------------------------------------

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val p = nsPath(namespace)
    namespace.nonEmpty && fs.exists(p) && !isTableDir(p)
  }

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    if (!fs.exists(root)) return Array.empty
    fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filterNot(isTableDir)
      .map(p => Array(p.getName))
  }

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val dir = nsPath(namespace)
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      .filterNot(isTableDir)
      .map(p => namespace :+ p.getName)
  }

  override def loadNamespaceMetadata(namespace: Array[String])
      : java.util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    Collections.emptyMap()
  }

  override def createNamespace(
      namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    if (namespaceExists(namespace))
      throw new NamespaceAlreadyExistsException(namespace)
    fs.mkdirs(nsPath(namespace))
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces carry no metadata to alter")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) return false
    val dir = nsPath(namespace)
    if (!cascade && fs.listStatus(dir).nonEmpty)
      throw new NonEmptyNamespaceException(namespace)
    fs.delete(dir, true)
  }

  // ---- ProcedureCatalog: CALL graft.system.<proc>(...) ---------------

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftCatalog.ProcedureNames
      .map(n => Identifier.of(Array("system"), n)).toArray

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace.sameElements(Array("system")),
      s"procedures live under $catalogName.system, got $ident")
    val makeSnapshot = (tableArg: String) => {
      val parts = tableArg.split('.').toSeq
      val path = ((warehouse +: parts.init) :+ parts.last).mkString("/")
      val t = SnapshotTable(spark, path, "_unused_read_only")
      require(t.exists, s"no graft table '$tableArg' under $warehouse")
      t
    }
    GraftCatalog.procedure(ident.name, makeSnapshot).getOrElse(
      throw new UnsupportedOperationException(
        s"unknown procedure $catalogName.system.${ident.name} " +
          s"(have: ${GraftCatalog.ProcedureNames.mkString(", ")})"))
  }
}

object GraftCatalog {

  /** Register this catalog on a session under `name` (idempotent).
    * V2 catalogs resolve lazily from conf, so no builder change is
    * needed — but the warehouse is pinned at first use. */
  def register(spark: SparkSession, name: String, warehouse: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", warehouse)
  }

  private[sources] val ProcedureNames =
    Seq("vacuum", "compact", "restore", "history", "zorder",
      "tag", "drop_tag", "tags", "files",
      "create_branch", "publish_branch", "drop_branch", "branches",
      "refresh_mv", "repartition_to", "migrate_spec")

  /** One row of procedure output, all columns pre-encoded. */
  private def row(vals: Any*): InternalRow = InternalRow.fromSeq(vals.map {
    case s: String => UTF8String.fromString(s)
    case other => other
  })

  private final case class ResultScan(out: StructType,
                                      rs: Array[InternalRow])
      extends LocalScan {
    override def rows(): Array[InternalRow] = rs
    override def readSchema(): StructType = out
  }

  /** A procedure whose bind is identity (parameters are statically
    * typed) and whose result is one in-memory scan. */
  private abstract class Proc(procName: String, desc: String,
                              params: Seq[ProcedureParameter])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false
    def run(input: InternalRow): (StructType, Array[InternalRow])
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (schema, rows) = run(input)
      Collections.singletonList[Scan](ResultScan(schema, rows)).iterator()
    }
  }

  private def in(name: String, dt: org.apache.spark.sql.types.DataType) =
    ProcedureParameter.in(name, dt).build()
  private def inDefault(name: String,
                        dt: org.apache.spark.sql.types.DataType,
                        default: String) =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private val StatusSchema = StructType(Seq(
    StructField("table", DataTypes.StringType, nullable = false),
    StructField("head_version", DataTypes.LongType, nullable = false),
    StructField("live_files", DataTypes.LongType, nullable = false)))

  private def statusRow(tableArg: String, t: SnapshotTable) =
    Array(row(tableArg, t.currentVersion.getOrElse(-1L),
      // one head-manifest read — history would pay a metadata probe +
      // parse per retained version just to take the first element
      t.currentVersion.fold(0L)(v => t.scanInfo(Some(v))._1.size.toLong)))

  /** The maintenance surface, Iceberg-procedure style: each returns a
    * small status relation so `CALL` output is inspectable. */
  private[sources] def procedure(
      name: String,
      snapshotOf: String => SnapshotTable): Option[UnboundProcedure] =
    name match {
      case "vacuum" => Some(new Proc("vacuum",
        "reclaim files unreferenced by the newest keep_versions " +
          "manifests; dry_run => true lists what WOULD go, touching " +
          "nothing",
        Seq(in("table", DataTypes.StringType),
          inDefault("keep_versions", DataTypes.IntegerType, "2"),
          inDefault("retention_ms", DataTypes.LongType, "3600000"),
          inDefault("dry_run", DataTypes.BooleanType, "false"))) {
        override def run(input: InternalRow) = {
          val arg = input.getUTF8String(0).toString
          val t = snapshotOf(arg)
          if (!input.isNullAt(3) && input.getBoolean(3)) {
            val schema = StructType(Seq(
              StructField("would_delete", DataTypes.StringType,
                nullable = false)))
            (schema, t.vacuumDryRun(input.getInt(1), input.getLong(2))
              .map(row(_)).toArray)
          } else {
            t.vacuum(input.getInt(1), input.getLong(2))
            (StatusSchema, statusRow(arg, t))
          }
        }
      })
      case "refresh_mv" => Some(new Proc("refresh_mv",
        "fold the source change feed into a DEFINED materialized view " +
          "(created through MaterializedAgg.define*)",
        Seq(in("table", DataTypes.StringType))) {
        override def run(input: InternalRow) = {
          val arg = input.getUTF8String(0).toString
          // the catalog handle is read-keyed; the view writes under
          // its conventional key, everything else (clustered layout,
          // logged props) resolves from the view's own manifest
          val view = snapshotOf(arg)
            .withPrimaryKey(graft.plans.MaterializedAgg.KeyCol)
          graft.plans.MaterializedAgg.refreshByDefinition(view)
          val schema = StructType(Seq(
            StructField("table", DataTypes.StringType, nullable = false),
            StructField("view_version", DataTypes.LongType, nullable = false),
            StructField("source_version", DataTypes.LongType,
              nullable = false)))
          (schema, Array(row(arg, view.currentVersion.getOrElse(-1L),
            view.properties
              .get(graft.plans.MaterializedAgg.SourceVersionProp)
              .flatMap(_.toLongOption).getOrElse(-1L))))
        }
      })
      case "compact" => Some(new Proc("compact",
        "bin-pack small files into ~target_file_bytes files, one commit",
        Seq(in("table", DataTypes.StringType),
          inDefault("target_file_bytes", DataTypes.LongType,
            (128L * 1024 * 1024).toString),
          inDefault("min_files", DataTypes.IntegerType, "2"))) {
        override def run(input: InternalRow) = {
          val arg = input.getUTF8String(0).toString
          val t = snapshotOf(arg)
          t.compact(input.getLong(1), input.getInt(2))
          (StatusSchema, statusRow(arg, t))
        }
      })
      case "repartition_to" => Some(new Proc("repartition_to",
        "partition-spec evolution, metadata-only: new commits write " +
          "the new layout, committed files stay live under their own",
        Seq(in("table", DataTypes.StringType),
          in("cols", DataTypes.StringType))) {
        override def run(input: InternalRow) = {
          val arg = input.getUTF8String(0).toString
          val cols = input.getUTF8String(1).toString
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq
          val t = snapshotOf(arg)
          t.repartitionTo(cols)
          (StatusSchema, statusRow(arg, t))
        }
      })
      case "migrate_spec" => Some(new Proc("migrate_spec",
        "rewrite files still laid out under an older partition spec " +
          "into the current one — completes repartition_to eagerly",
        Seq(in("table", DataTypes.StringType))) {
        override def run(input: InternalRow) = {
          val arg = input.getUTF8String(0).toString
          val t = snapshotOf(arg)
          t.migrateSpec()
          (StatusSchema, statusRow(arg, t))
        }
      })
      case "restore" => Some(new Proc("restore",
        "metadata-only rollback: next version = copy of target manifest",
        Seq(in("table", DataTypes.StringType),
          in("version", DataTypes.LongType))) {
        override def run(input: InternalRow) = {
          val arg = input.getUTF8String(0).toString
          val t = snapshotOf(arg)
          t.restoreTo(input.getLong(1))
          (StatusSchema, statusRow(arg, t))
        }
      })
      case "zorder" => Some(new Proc("zorder",
        "rewrite the table clustered along the Morton curve over cols " +
          "so min/max stats prune box predicates on every listed column",
        Seq(in("table", DataTypes.StringType),
          in("cols", DataTypes.StringType),
          inDefault("num_files", DataTypes.IntegerType, "16"),
          inDefault("bits", DataTypes.IntegerType, "12"))) {
        override def run(input: InternalRow) = {
          val arg = input.getUTF8String(0).toString
          val cols = input.getUTF8String(1).toString
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq
          require(cols.nonEmpty, "zorder needs at least one column")
          val t0 = snapshotOf(arg)
          // partitioned tables write one file per partition dir, so an
          // intra-file curve order has no per-file stats to sharpen —
          // the honest answer is to refuse, not silently no-op
          require(t0.tablePartitionCols.isEmpty,
            s"zorder rewrites whole unpartitioned tables; '$arg' is " +
              s"partitioned by ${t0.tablePartitionCols.mkString(",")}")
          // a logged linear clusterBy layout would re-range the rewrite
          // on ITS columns, silently undoing the curve order — refuse
          // rather than report a success that clustered nothing
          require(t0.clusterColumns.isEmpty,
            s"'$arg' declares linear clustering on " +
              s"${t0.clusterColumns.mkString(",")} — every write " +
              "re-ranges on it, which would undo a z-order rewrite")
          // the rewrite is only worth its I/O if min/max stats cover
          // the curve columns: extend the logged stats layout (never
          // shrink it — other columns' skipping must survive)
          val t = SnapshotTable(SparkSession.active, t0.path,
            "_unused_read_only",
            statsCols = (t0.statsColumns ++ cols).distinct)
          t.replace(graft.operators.ZOrder.cluster(
            t.read, cols, input.getInt(2), input.getInt(3)))
          (StatusSchema, statusRow(arg, t))
        }
      })
      case "create_branch" => Some(new Proc("create_branch",
        "fork a writable branch from a retained version (version -1 = " +
          "the current head); main vacuum keeps its references until " +
          "drop_branch",
        Seq(in("table", DataTypes.StringType),
          in("name", DataTypes.StringType),
          inDefault("version", DataTypes.LongType, "-1"))) {
        override def run(input: InternalRow) = {
          val arg = input.getUTF8String(0).toString
          val t = snapshotOf(arg)
          val v = input.getLong(2)
          t.createBranch(input.getUTF8String(1).toString,
            if (v < 0) None else Some(v))
          (StatusSchema, statusRow(arg, t))
        }
      })
      case "publish_branch" => Some(new Proc("publish_branch",
        "fast-forward main to the branch head (write-audit-publish); " +
          "fails if main diverged past the fork point",
        Seq(in("table", DataTypes.StringType),
          in("name", DataTypes.StringType))) {
        override def run(input: InternalRow) = {
          val arg = input.getUTF8String(0).toString
          val t = snapshotOf(arg)
          t.publishBranch(input.getUTF8String(1).toString)
          (StatusSchema, statusRow(arg, t))
        }
      })
      case "drop_branch" => Some(new Proc("drop_branch",
        "drop a branch whole; its files release to the next vacuum",
        Seq(in("table", DataTypes.StringType),
          in("name", DataTypes.StringType))) {
        override def run(input: InternalRow) = {
          val arg = input.getUTF8String(0).toString
          val t = snapshotOf(arg)
          t.dropBranch(input.getUTF8String(1).toString)
          (StatusSchema, statusRow(arg, t))
        }
      })
      case "branches" => Some(new Proc("branches",
        "list branches: name and head version",
        Seq(in("table", DataTypes.StringType))) {
        override def run(input: InternalRow) = {
          val t = snapshotOf(input.getUTF8String(0).toString)
          val schema = StructType(Seq(
            StructField("name", DataTypes.StringType, nullable = false),
            StructField("head_version", DataTypes.LongType,
              nullable = false)))
          (schema, t.branches.map(b =>
            row(b, t.forBranch(b).currentVersion.getOrElse(-1L)))
            .toArray)
        }
      })
      case "files" => Some(new Proc("files",
        "live files of the current snapshot: path, partition, bytes, " +
          "merge-on-read deleted-row count",
        Seq(in("table", DataTypes.StringType))) {
        override def run(input: InternalRow) = {
          val t = snapshotOf(input.getUTF8String(0).toString)
          val schema = StructType(Seq(
            StructField("path", DataTypes.StringType, nullable = false),
            StructField("partition", DataTypes.StringType, nullable = false),
            StructField("bytes", DataTypes.LongType, nullable = false),
            StructField("deleted_rows", DataTypes.LongType,
              nullable = false)))
          val entries = t.currentVersion
            .map(v => t.scanInfo(Some(v))._1).getOrElse(Nil)
          (schema, entries.sortBy(_.path).map(e =>
            row(e.path, SnapshotTable.partOf(e.path), e.len,
              e.deletedRows.length.toLong)).toArray)
        }
      })
      case "tag" => Some(new Proc("tag",
        "pin a retained version under a name; vacuum keeps it until " +
          "drop_tag (version -1 = the current head)",
        Seq(in("table", DataTypes.StringType),
          in("name", DataTypes.StringType),
          inDefault("version", DataTypes.LongType, "-1"))) {
        override def run(input: InternalRow) = {
          val arg = input.getUTF8String(0).toString
          val t = snapshotOf(arg)
          val v = input.getLong(2)
          t.tag(input.getUTF8String(1).toString,
            if (v < 0) None else Some(v))
          (StatusSchema, statusRow(arg, t))
        }
      })
      case "drop_tag" => Some(new Proc("drop_tag",
        "remove a tag; its version becomes reclaimable by vacuum",
        Seq(in("table", DataTypes.StringType),
          in("name", DataTypes.StringType))) {
        override def run(input: InternalRow) = {
          val arg = input.getUTF8String(0).toString
          val t = snapshotOf(arg)
          t.dropTag(input.getUTF8String(1).toString)
          (StatusSchema, statusRow(arg, t))
        }
      })
      case "tags" => Some(new Proc("tags",
        "list tags: name and pinned version",
        Seq(in("table", DataTypes.StringType))) {
        override def run(input: InternalRow) = {
          val t = snapshotOf(input.getUTF8String(0).toString)
          val schema = StructType(Seq(
            StructField("name", DataTypes.StringType, nullable = false),
            StructField("version", DataTypes.LongType, nullable = false)))
          (schema, t.tags.toSeq.sortBy(_._1)
            .map { case (n, v) => row(n, v) }.toArray)
        }
      })
      case "history" => Some(new Proc("history",
        "retained commits, newest first: version, commit time, file count",
        Seq(in("table", DataTypes.StringType))) {
        override def run(input: InternalRow) = {
          val t = snapshotOf(input.getUTF8String(0).toString)
          val schema = StructType(Seq(
            StructField("version", DataTypes.LongType, nullable = false),
            StructField("committed_at", DataTypes.TimestampType,
              nullable = false),
            StructField("live_files", DataTypes.LongType, nullable = false)))
          (schema, t.history.map { case (v, ms, files) =>
            row(v, ms * 1000L, files.toLong)
          }.toArray)
        }
      })
      case _ => None
    }
}
