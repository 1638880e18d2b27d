package graft.plans

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeReference, BoundReference, Cast, EqualTo, EvalMode,
  Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual,
  Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{
  FileStatusCache, PartitionDirectory, PartitioningAwareFileIndex,
  PartitionPath, PartitionSpec}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.SnapshotTable.FileEntry

/** A [[FileIndex]] whose file listing IS the snapshot manifest — the
  * Delta/Iceberg planning model: scan planning consults ZERO filesystem
  * metadata (no directory listing, no per-file stat — the manifest
  * already carries every path, length and partition value), so planning
  * cost is O(manifest) driver work regardless of table size or object
  * store latency. This is what makes the scaladoc's "reads list no
  * directories at all" literally true: with a plain
  * `spark.read.parquet(paths*)` Spark still stats every explicit path
  * (measured: ~5s per 2,400-file snapshot read at the pipeline's
  * shape — twice per upsert).
  *
  * Partition pruning still happens at planning time: Hive-style
  * partition values are parsed from the manifest paths, and Catalyst's
  * partition filters are evaluated here against those values, so a
  * pruned scan opens only matching partitions' files — same contract as
  * [[org.apache.spark.sql.execution.datasources.InMemoryFileIndex]],
  * different (free) source of truth. */
final class ManifestFileIndex private (
    spark: SparkSession,
    dataDir: String,
    src: ManifestFileIndex.EntriesSource,
    override val partitionSchema: StructType)
  // PartitioningAwareFileIndex (not bare FileIndex) so Spark's own
  // ParquetScanBuilder/ParquetScan — the vectorized DSv2 parquet read
  // stack — can plan directly on top of this index; every listing
  // member is overridden to answer from the manifest, so the base
  // class's filesystem machinery is never invoked
  extends PartitioningAwareFileIndex(
    spark, Map.empty, None, FileStatusCache.getOrCreate(spark)) {

  /** The classic shape: a driver-side entry list (already-parsed
    * manifest state). */
  def this(spark: SparkSession, dataDir: String, entries: Seq[FileEntry],
           partitionSchema: StructType) =
    this(spark, dataDir, new ManifestFileIndex.EagerEntries(entries),
      partitionSchema)

  // the FULL entry list — the fallback the pruned planning path never
  // touches; in lazy mode this is the one member that collects
  // O(live files) to the driver, and only the rarely-consulted
  // members below reach for it
  private lazy val entries: Seq[FileEntry] = src.all

  // real partition fields (any number of levels) may be followed by the
  // reserved _partition metadata field, never interleaved
  require(partitionSchema.fields.zipWithIndex.forall { case (f, i) =>
      f.name != ManifestFileIndex.MetaPartitionCol ||
        i == partitionSchema.fields.length - 1
    }, s"${ManifestFileIndex.MetaPartitionCol} must be the last field")

  private val realPartitionFields = partitionSchema.fields
    .filterNot(_.name == ManifestFileIndex.MetaPartitionCol)

  override def rootPaths: Seq[Path] = Seq(new Path(dataDir))

  private lazy val cachedSize: Long = src.totalLen
  override def sizeInBytes: Long = cachedSize

  override def inputFiles: Array[String] =
    entries.map(e => s"$dataDir/${e.path}").toArray

  override def refresh(): Unit = () // a snapshot is immutable

  private def statusOf(e: FileEntry): FileStatus = {
    // an entry without a recorded length (pre-meta manifest reaching
    // this class without scanInfo's backfill) must fall back to a real
    // stat: a FileStatus with length -1 plans ZERO splits and the
    // file's rows silently vanish from the scan
    val len =
      if (e.len >= 0) e.len
      else new Path(s"$dataDir/${e.path}")
        .getFileSystem(spark.sessionState.newHadoopConf())
        .getFileStatus(new Path(s"$dataDir/${e.path}")).getLen
    new FileStatus(len, false, 1, 128L * 1024 * 1024, e.mtime,
      new Path(s"$dataDir/${e.path}"))
  }

  // ---- PartitioningAwareFileIndex contract, answered from the
  // manifest alone (zero filesystem calls — the whole point)

  // a snapshot index is immutable (refresh() is a no-op), so the
  // structures the base class consults repeatedly during planning are
  // computed once — from the DISTINCT partition dirs, O(partitions)
  // driver state in both modes
  private lazy val computedSpec: PartitionSpec =
    if (partitionSchema.isEmpty) PartitionSpec.emptySpec
    else PartitionSpec(partitionSchema,
      src.distinctRawDirs.map { raw =>
        val dir = realPartitionFields.map(_.name)
          .zip(raw.split("/", -1)).map { case (n, v) => s"$n=$v" }
          .mkString("/")
        PartitionPath(partitionRow(raw), new Path(s"$dataDir/$dir"))
      })

  override def partitionSpec(): PartitionSpec = computedSpec

  override protected lazy val leafFiles
      : scala.collection.mutable.LinkedHashMap[Path, FileStatus] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[Path, FileStatus]
    entries.foreach { e => val st = statusOf(e); m += (st.getPath -> st) }
    m
  }

  override protected lazy val leafDirToChildrenFiles
      : Map[Path, Array[FileStatus]] =
    entries.map(statusOf).groupBy(_.getPath.getParent)
      .map { case (dir, sts) => dir -> sts.toArray }

  /** The Hive dir value parsed back to `dt`;
    * __HIVE_DEFAULT_PARTITION__ → null. LEGACY cast: an unparseable
    * value becomes null rather than failing the scan, matching Spark's
    * own partition-value parsing. */
  private def partitionValue(raw: String,
                             dt: org.apache.spark.sql.types.DataType): Any = {
    val unescaped = ExternalCatalogUtils.unescapePathName(raw)
    if (unescaped == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
    else if (dt == StringType) UTF8String.fromString(unescaped)
    else Cast(
      Literal(UTF8String.fromString(unescaped), StringType), dt,
      Some(spark.sessionState.conf.sessionLocalTimeZone),
      EvalMode.LEGACY).eval(null)
  }

  /** One row over `partitionSchema` for a (possibly "/"-joined
    * multi-level) Hive dir value. The reserved
    * [[ManifestFileIndex.MetaPartitionCol]] field carries the RAW
    * (still-escaped) joined dir string — the `_partition` metadata
    * column row-level operations group by; real partition fields parse
    * positionally by type ('/' never appears inside an escaped
    * value). */
  private def partitionRow(raw: String): InternalRow = {
    val levels = raw.split("/", -1)
    InternalRow.fromSeq(partitionSchema.fields.toIndexedSeq.map { f =>
      if (f.name == ManifestFileIndex.MetaPartitionCol)
        UTF8String.fromString(raw)
      else {
        val i = realPartitionFields.indexWhere(_.name == f.name)
        partitionValue(if (i < levels.length) levels(i) else "", f.dataType)
      }
    })
  }

  private def partOf(rel: String): String = SnapshotTable.partOf(rel)

  /** Conjunctive [lo, hi] bounds (encoded in the manifest's tagged-value
    * form) extracted from the query's data filters. Only shapes that can
    * prune are collected — anything else (OR, UDFs, casts, unsupported
    * literal types) simply contributes no bound, which can never be
    * wrong, only useless. */
  private def filterBounds(filters: Seq[Expression])
      : Seq[(String, Option[String], Option[String])] = {
    import org.apache.spark.sql.types.{DateType, Decimal, DecimalType,
      TimestampNTZType, TimestampType}
    // the literal's DECLARED type decides the tag family: a DateType
    // Int is days (→ "T:" micros), not a plain number — encoding it
    // "L:" would compare against the wrong unit. Each family matches
    // [[SnapshotTable.footerProbe]]'s stat tags exactly.
    def enc(v: Any, dt: org.apache.spark.sql.types.DataType)
        : Option[String] = (v, dt) match {
      case (n: Int, DateType) =>
        Some(FileEntry.encMicros(
          FileEntry.scaleMicros(n, FileEntry.MicrosPerDay)))
      case (n: Long, TimestampType | TimestampNTZType) =>
        Some(FileEntry.encMicros(n))
      case (d: Decimal, _: DecimalType) =>
        Some(FileEntry.encDecimal(d.toJavaBigDecimal))
      case (_, DateType | TimestampType | TimestampNTZType |
               _: DecimalType) => None
      case (n: Long, _) => Some(s"L:$n")
      case (n: Int, _) => Some(s"L:$n")
      case (n: Short, _) => Some(s"L:$n")
      case (n: Byte, _) => Some(s"L:$n")
      case (n: Double, _) => Some(s"D:$n")
      case (n: Float, _) => Some(s"D:${n.toDouble}")
      case (s: UTF8String, _) => Some(FileEntry.encS(s.toString))
      case _ => None // intervals/binary/etc: no pruning, never wrong
    }
    def walk(e: Expression): Seq[(String, Option[String], Option[String])] =
      e match {
        case And(l, r) => walk(l) ++ walk(r)
        case EqualTo(a: AttributeReference, Literal(v, t)) =>
          enc(v, t).toSeq.map(x => (a.name, Some(x), Some(x)))
        case EqualTo(Literal(v, t), a: AttributeReference) =>
          enc(v, t).toSeq.map(x => (a.name, Some(x), Some(x)))
        case GreaterThan(a: AttributeReference, Literal(v, t)) =>
          enc(v, t).toSeq.map(x => (a.name, Some(x), None))
        case GreaterThanOrEqual(a: AttributeReference, Literal(v, t)) =>
          enc(v, t).toSeq.map(x => (a.name, Some(x), None))
        case LessThan(Literal(v, t), a: AttributeReference) =>
          enc(v, t).toSeq.map(x => (a.name, Some(x), None))
        case LessThanOrEqual(Literal(v, t), a: AttributeReference) =>
          enc(v, t).toSeq.map(x => (a.name, Some(x), None))
        case LessThan(a: AttributeReference, Literal(v, t)) =>
          enc(v, t).toSeq.map(x => (a.name, None, Some(x)))
        case LessThanOrEqual(a: AttributeReference, Literal(v, t)) =>
          enc(v, t).toSeq.map(x => (a.name, None, Some(x)))
        case GreaterThan(Literal(v, t), a: AttributeReference) =>
          enc(v, t).toSeq.map(x => (a.name, None, Some(x)))
        case GreaterThanOrEqual(Literal(v, t), a: AttributeReference) =>
          enc(v, t).toSeq.map(x => (a.name, None, Some(x)))
        case _ => Nil
      }
    filters.flatMap(walk)
  }

  /** Delta-style automatic data skipping: a file whose manifest min/max
    * range provably can't overlap EVERY bound is dropped at planning
    * time — for any read with pushable filters, not just
    * [[SnapshotTable.readWhere]]. Files without stats for a bound's
    * column (or stats of another type family) are conservatively kept;
    * the exact filter still runs on top of the scan. */
  private def skipByStats(es: Seq[FileEntry],
                          dataFilters: Seq[Expression]): Seq[FileEntry] = {
    val bounds = filterBounds(dataFilters)
    if (bounds.isEmpty) es
    else es.filter(e => bounds.forall { case (c, lo, hi) =>
      e.stats.get(c) match {
        case Some((mn, mx)) if lo.forall(_.take(2) == mn.take(2)) &&
            hi.forall(_.take(2) == mx.take(2)) =>
          val ord = FileEntry.valueOrdering
          hi.forall(h => ord.lteq(mn, h)) && lo.forall(l => ord.gteq(mx, l))
        case _ => true // no/foreign-typed stats: never prune
      }
    })
  }

  // dynamic-partition-pruning narrowing, delivered AFTER the dim-side
  // subquery ran (the scan's SupportsRuntimeV2Filtering.filter call):
  // appended to every subsequent listing. Monotone — runtime filters
  // may only SKIP partitions the static plan kept, never add any, so
  // racing re-plans stay correct.
  @volatile private var runtimeFilters: Seq[Expression] = Nil

  private[graft] def narrowForRuntime(filters: Seq[Expression]): Unit =
    runtimeFilters = runtimeFilters ++ filters

  /** DATA columns a runtime join-key filter can skip files on: those
    * with manifest min/max stats or a per-file bloom. */
  private[graft] lazy val skippableDataColumns: Seq[String] = {
    val keys = src.statKeys.toSet
    val plain = keys.filterNot(_.contains(":"))
    val bloomed = keys.collect {
      case k if k.startsWith("bloom:") => k.stripPrefix("bloom:")
    }
    (plain ++ bloomed).toSeq.sorted
  }

  // runtime join-key narrowing on DATA columns (the file-level analog
  // of dynamic partition pruning): per column, the distinct keys that
  // survived the dim side. A file stays only while SOME key could be
  // in it — inside its min/max range AND not ruled out by its bloom.
  // Unknown types / missing stats keep the file: skipping may only be
  // useless, never wrong.
  @volatile private var runtimeKeySets: Seq[(String, Seq[Any])] = Nil

  private[graft] def narrowDataForRuntime(col: String,
                                          values: Seq[Any]): Unit =
    runtimeKeySets = runtimeKeySets :+ (col -> values)

  private def skipByKeySets(es: Seq[FileEntry]): Seq[FileEntry] = {
    val sets = runtimeKeySets
    if (sets.isEmpty) return es
    // encode each probe value once per column (not per file), and
    // decode each file's bloom once per column (not per key) — a
    // 1,000-key × 1,000-file narrowing must not Base64-decode a
    // million sketches
    val encoded: Seq[(String, Seq[(Any, Option[String])])] =
      sets.map { case (c, vs) =>
        c -> vs.map { v =>
          v -> (v match {
            case s: UTF8String => Some(FileEntry.encS(s.toString))
            case _: Long | _: Int | _: Short | _: Byte | _: Double |
                 _: Float => Some(FileEntry.enc(v))
            case _ => None
          })
        }
      }
    es.filter { e =>
      encoded.forall { case (c, vs) =>
        val stats = e.stats.get(c)
        val bloom = e.bloom(c)
        def inRange(enc: Option[String]): Boolean = (enc, stats) match {
          case (Some(x), Some((mn, mx)))
            if x.take(2) == mn.take(2) && x.take(2) == mx.take(2) =>
            val ord = FileEntry.valueOrdering
            ord.lteq(mn, x) && ord.gteq(mx, x)
          case _ => true
        }
        def bloomMaybe(v: Any): Boolean = bloom match {
          case Some(("BL:", bf)) => v match {
            case n: Long => bf.mightContainLong(n)
            case n: Int => bf.mightContainLong(n.toLong)
            case n: Short => bf.mightContainLong(n.toLong)
            case n: Byte => bf.mightContainLong(n.toLong)
            case _ => true
          }
          case Some(("BS:", bf)) => v match {
            case s: UTF8String => bf.mightContainString(s.toString)
            case _ => true
          }
          case _ => true
        }
        vs.exists { case (v, enc) =>
          v == null || (inRange(enc) && bloomMaybe(v))
        }
      }
    }
  }

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val allPartFilters = partitionFilters ++ runtimeFilters
    if (partitionSchema.isEmpty) {
      val kept = skipByKeySets(skipByStats(entries, dataFilters))
      Seq(PartitionDirectory(InternalRow.empty, kept.map(statusOf).toArray))
    } else {
      // prune partition DIRS first — O(distinct partitions) driver
      // work — then materialize ONLY the surviving partitions' entries
      // (in lazy mode that is a distributed filter over the checkpoint
      // twin; the driver never holds the pruned-away partitions)
      val rawDirs = src.distinctRawDirs
      val surviving =
        if (allPartFilters.isEmpty) rawDirs
        else {
          // bind by NAME against the partition attributes — the
          // incoming filters reference the relation's attribute
          // instances, whose exprIds a fresh index cannot know (same
          // binding InMemoryFileIndex.prunePartitions does)
          val bound = allPartFilters.reduce(And).transform {
            case a: AttributeReference =>
              BoundReference(partitionSchema.fieldIndex(a.name),
                a.dataType, a.nullable)
          }
          val pred = Predicate.createInterpreted(bound)
          pred.initialize(0)
          rawDirs.filter(raw => pred.eval(partitionRow(raw)))
        }
      val candidates =
        if (surviving.size == rawDirs.size) entries
        else src.forRawDirs(surviving)
      val kept = skipByKeySets(skipByStats(candidates, dataFilters))
      kept.groupBy(e => partOf(e.path)).toSeq.map { case (raw, es) =>
        PartitionDirectory(partitionRow(raw), es.map(statusOf).toArray)
      }
    }
  }
}

object ManifestFileIndex {
  /** Name of the reserved metadata "partition" field: when present in
    * an index's `partitionSchema`, every row of a file reads this field
    * as the file's RAW Hive-encoded partition-dir value ("" for
    * unpartitioned tables). This is how the `_partition` METADATA
    * column ([[graft.sources.GraftTable]]) is served without touching
    * the parquet readers: to the scan it is just one more partition
    * column whose value comes from the manifest path. */
  val MetaPartitionCol = "_partition"

  /** An index planning from the UNCOLLECTED checkpoint-twin DataFrame
    * ([[SnapshotTable.CkptSchema]] rows, as composed by
    * [[SnapshotTable!.lazyScanState]]): partition-pruned listings
    * materialize only matching partitions' entries on the driver. */
  private[graft] def lazyIndex(spark: SparkSession, dataDir: String,
                               entriesDF: org.apache.spark.sql.DataFrame,
                               partitionSchema: StructType)
      : ManifestFileIndex =
    new ManifestFileIndex(spark, dataDir, new LazyEntries(entriesDF),
      partitionSchema)

  /** The PARENT-DIR (table-relative) of a twin row's path, as a column
    * expression — '' for root-level files. Collecting its DISTINCT
    * values is the O(partitions) driver handshake both the lazy index
    * and [[graft.sources.GraftTable]]'s uniform-spec check run. */
  private[graft] val ParentDirExpr: org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr(
      "case when instr(path, '/') = 0 then '' " +
        "else regexp_extract(path, '^(.*)/[^/]*$', 1) end")

  /** Where an index's listing comes from. Both modes keep the pruned
    * planning path at O(matching files) driver memory; only `all`
    * (the no-partition-filter fallback) is O(live files). */
  private[graft] sealed trait EntriesSource {
    def all: Seq[FileEntry]
    /** Distinct RAW partition-dir values ([[SnapshotTable.partOf]]
      * form) — O(partitions). */
    def distinctRawDirs: Seq[String]
    /** Entries of exactly these raw dirs — O(matching files). */
    def forRawDirs(dirs: Seq[String]): Seq[FileEntry]
    def totalLen: Long
    /** Distinct stat keys across the listing. */
    def statKeys: Seq[String]
  }

  private[graft] final class EagerEntries(entries: Seq[FileEntry])
      extends EntriesSource {
    def all: Seq[FileEntry] = entries
    lazy val distinctRawDirs: Seq[String] =
      entries.map(e => SnapshotTable.partOf(e.path)).distinct
    def forRawDirs(dirs: Seq[String]): Seq[FileEntry] = {
      val s = dirs.toSet
      entries.filter(e => s(SnapshotTable.partOf(e.path)))
    }
    def totalLen: Long = entries.map(_.len max 0L).sum
    def statKeys: Seq[String] =
      entries.iterator.flatMap(_.stats.keys).toSet.toSeq.sorted
  }

  private[graft] final class LazyEntries(
      df: org.apache.spark.sql.DataFrame) extends EntriesSource {
    import org.apache.spark.sql.functions._
    // parent dir → raw partition value, collected ONCE (distributed
    // distinct, O(partitions) driver). partOf stays the single
    // definition of path→values — the SQL side only splits off the
    // filename, the driver maps the (few) distinct parents.
    private lazy val parentToRaw: Map[String, String] =
      df.select(ParentDirExpr.as("__p")).distinct().collect()
        .map { r =>
          val p = r.getString(0)
          p -> SnapshotTable.partOf(if (p.isEmpty) "f" else s"$p/f")
        }.toMap
    lazy val all: Seq[FileEntry] =
      df.collect().iterator.map(SnapshotTable.entryOfCkptRow).toSeq
    def distinctRawDirs: Seq[String] =
      parentToRaw.values.toSeq.distinct
    def forRawDirs(dirs: Seq[String]): Seq[FileEntry] = {
      val raw = dirs.toSet
      val parents = parentToRaw.collect {
        case (p, r) if raw(r) => p
      }.toSeq
      if (parents.isEmpty) Nil
      else df.filter(ParentDirExpr.isin(parents: _*))
        .collect().iterator.map(SnapshotTable.entryOfCkptRow).toSeq
    }
    lazy val totalLen: Long = {
      val metaLit = SnapshotTable.FileEntry.MetaKey
      val r = df.agg(expr(
        s"""coalesce(sum(case when array_position(skeys, '$metaLit') > 0
           |  then greatest(cast(substring(element_at(smins,
           |    cast(array_position(skeys, '$metaLit') as int)), 3)
           |    as bigint), 0L)
           |  else 0L end), 0L)""".stripMargin)).head()
      r.getLong(0)
    }
    lazy val statKeys: Seq[String] =
      df.select(explode(col("skeys")).as("__k")).distinct()
        .collect().map(_.getString(0)).toSeq.sorted
  }
}
