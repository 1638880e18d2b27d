package graft.plans

import java.nio.charset.StandardCharsets
import java.util.UUID

import scala.collection.mutable

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** A partitioned parquet table with ATOMIC multi-partition commits via a
  * manifest pointer file — the missing half of [[LakehouseTable]]'s
  * consistency story (its dynamic partition overwrite commits per
  * partition, so a mid-job crash can expose a mixed table state until
  * retry). Here every commit is all-or-nothing, Delta/Iceberg-style
  * (reference analog: Delta MERGE's atomic commit, orders_etl.py:67-71),
  * with no Delta jar:
  *
  *  - Data files are immutable, written under Hive-style partition dirs
  *    `data/<pc>=<value>/<commit>-<file>.parquet`; a commit never
  *    modifies or deletes a live file.
  *  - A snapshot is a manifest under `_commits/v<N>.manifest` listing
  *    exactly the files it contains (per partition). The COMMIT POINT is
  *    the single atomic rename of the manifest tmp file into `_commits/`
  *    — readers resolve max(version) and see either the old or the new
  *    snapshot, never a mix, no matter where a writer died.
  *  - A crashed commit leaves orphan data files referenced by no
  *    manifest; they are invisible to readers and reclaimed by
  *    [[vacuum]].
  *
  * Scale notes (100 TB): the manifest is driver-side METADATA — O(live
  * files) lines, the same information Iceberg keeps in avro manifests —
  * while data moves stay distributed. `upsert` reads and rewrites only
  * the partitions the batch touches (metadata-level partition pruning:
  * untouched partitions carry over by reference, zero I/O). Reads list
  * no directories at all (no eventually-consistent listing, no
  * small-file LIST storms): the file set comes straight from the
  * manifest, partition values are parsed from the Hive paths under
  * `basePath`, so Catalyst still partition-prunes file-level.
  *
  * Old snapshots remain readable ([[readVersion]] — time travel) until
  * vacuumed.
  */
final class SnapshotTable(
    spark: SparkSession,
    val path: String,
    val primaryKey: String,
    val partitionCol: Option[String] = None,
    val declaredSchema: Option[StructType] = None) {

  private val dataDir = s"$path/data"
  private val commitsDir = s"$path/_commits"

  private def fs: FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---- manifest format: line 1 "version\t<n>", then "<file>" lines ----
  // (paths are table-relative so the table directory is relocatable)

  private def manifestPath(v: Long) = new Path(f"$commitsDir/v$v%09d.manifest")

  /** Highest committed version, or None for an empty/new table. */
  def currentVersion: Option[Long] = {
    val dir = new Path(commitsDir)
    if (!fs.exists(dir)) return None
    val vs = fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(n => n.stripPrefix("v").stripSuffix(".manifest").toLong)
    if (vs.isEmpty) None else Some(vs.max)
  }

  def exists: Boolean = currentVersion.isDefined

  private def readManifest(v: Long): Seq[String] = {
    val in = fs.open(manifestPath(v))
    try {
      val txt = new String(
        org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
      val lines = txt.split("\n").filter(_.nonEmpty).toSeq
      require(lines.head == s"version\t$v", s"manifest header mismatch at v$v")
      lines.tail
    } finally in.close()
  }

  /** Write manifest to a tmp name, then the ONE atomic rename that is
    * the commit point. A concurrent committer of the same version loses
    * the rename and fails cleanly (optimistic concurrency). */
  private def commitManifest(v: Long, files: Seq[String]): Unit = {
    fs.mkdirs(new Path(commitsDir))
    val tmp = new Path(s"$commitsDir/.tmp-${UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write((s"version\t$v\n" + files.mkString("\n") + "\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, manifestPath(v))) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"commit conflict: version $v already exists at $path")
    }
  }

  /** Snapshot read of a specific version (time travel). */
  def readVersion(v: Long): DataFrame = {
    val files = readManifest(v).map(f => s"$dataDir/$f")
    val r = spark.read.option("basePath", dataDir)
    val withSchema = declaredSchema.fold(r)(s => r.schema(s))
    withSchema.parquet(files: _*)
  }

  /** Snapshot read of the current version. */
  def read: DataFrame = readVersion(currentVersion.getOrElse(
    throw new IllegalStateException(s"no committed snapshot at $path")))

  /** Partition value encoded the way Spark writes Hive dirs (null →
    * __HIVE_DEFAULT_PARTITION__). */
  private def partOf(rel: String): String =
    rel.split("/").find(_.contains("=")).map(_.split("=", 2)(1)).getOrElse("")

  /** Write `df` as new immutable data files and return their
    * table-relative paths. The batch lands in a staging dir, then files
    * move (same-FS renames, metadata ops) into the canonical tree under
    * a fresh commit id so basePath partition parsing spans commits. */
  private def writeDataFiles(df: DataFrame): Seq[String] = {
    val commitId = UUID.randomUUID().toString.take(8)
    val stage = s"$path/_stage/$commitId"
    val clustered = partitionCol.fold(df)(c => df.repartition(col(c)))
    val w = clustered.write.mode("overwrite")
    partitionCol.fold(w)(c => w.partitionBy(c)).parquet(stage)
    val moved = mutable.Buffer.empty[String]
    def walk(p: Path, rel: String): Unit =
      fs.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory) walk(st.getPath, if (rel.isEmpty) name else s"$rel/$name")
        else if (name.endsWith(".parquet")) {
          val destRel =
            (if (rel.isEmpty) "" else s"$rel/") + s"$commitId-$name"
          val dest = new Path(s"$dataDir/$destRel")
          fs.mkdirs(dest.getParent)
          if (!fs.rename(st.getPath, dest))
            throw new IllegalStateException(s"data move failed: $dest")
          moved += destRel
        }
      }
    walk(new Path(stage), "")
    fs.delete(new Path(s"$path/_stage/$commitId"), true)
    moved.toSeq
  }

  /** Initial commit (v1). */
  def create(df: DataFrame): Unit = {
    require(!exists, s"table already exists at $path")
    commitManifest(1L, writeDataFiles(df))
  }

  /** MERGE-by-PK upsert as ONE atomic commit: touched partitions are
    * merged and rewritten as new files; untouched partitions carry over
    * BY REFERENCE (their existing files are listed unchanged in the new
    * manifest — zero data I/O). Readers see the old snapshot until the
    * manifest rename, then the new one, never a mix. */
  def upsert(source: DataFrame): Unit = {
    if (!exists) { create(source); return }
    val v = currentVersion.get
    val live = readManifest(v)
    val next = partitionCol match {
      case None =>
        val merged = read
          .join(source.select(primaryKey), Seq(primaryKey), "left_anti")
          .unionByName(source.select(read.columns.toIndexedSeq.map(col): _*))
        writeDataFiles(merged)
      case Some(pc) =>
        val touched = source.select(pc).distinct().collect()
          .map(r => if (r.isNullAt(0)) "__HIVE_DEFAULT_PARTITION__"
                    else r.get(0).toString).toSet
        val (touchedFiles, keptFiles) = live.partition(f => touched(partOf(f)))
        val current =
          if (touchedFiles.isEmpty) spark.emptyDataFrame // all-new partitions
          else {
            val r = spark.read.option("basePath", dataDir)
            declaredSchema.fold(r)(s => r.schema(s))
              .parquet(touchedFiles.map(f => s"$dataDir/$f"): _*)
          }
        val srcAligned =
          if (touchedFiles.isEmpty) source
          else source.select(current.columns.toIndexedSeq.map(col): _*)
        val merged =
          if (touchedFiles.isEmpty) srcAligned
          else current
            .join(source.select(primaryKey), Seq(primaryKey), "left_anti")
            .unionByName(srcAligned)
        keptFiles ++ writeDataFiles(merged)
    }
    commitManifest(v + 1, next)
  }

  private def readFiles(files: Seq[String]): DataFrame = {
    val r = spark.read.option("basePath", dataDir)
    declaredSchema.fold(r)(s => r.schema(s))
      .parquet(files.map(f => s"$dataDir/$f"): _*)
  }

  /** CDC / incremental read: the new row images committed in versions
    * (fromV, toV] — every row inserted or updated since fromV (upserts
    * never delete, so this is the complete change set). Downstream
    * consumers re-process only the delta instead of re-reading the
    * table.
    *
    * Cost is O(rewritten partitions), never O(table): files carried
    * over by reference are immutable and identical in both manifests,
    * so only files NEW in toV are read, diffed against fromV's files of
    * the same partitions (a rewrite includes the partition's unchanged
    * rows, which the EXCEPT removes). */
  def changes(fromV: Long, toV: Long): DataFrame = {
    require(fromV <= toV, s"changes: fromV $fromV > toV $toV")
    val before = readManifest(fromV).toSet
    val newFiles = readManifest(toV).filterNot(before)
    if (newFiles.isEmpty) return read.limit(0)
    val touched = newFiles.map(partOf).toSet
    val oldTouched = before.toSeq.filter(f => touched(partOf(f)))
    val newRows = readFiles(newFiles)
    if (oldTouched.isEmpty) newRows
    else newRows.except(readFiles(oldTouched))
  }

  /** OPTIMIZE analog: rewrite the current snapshot compacted, as one
    * atomic commit; old versions stay time-travelable until vacuum. */
  def compact(): Unit = {
    val v = currentVersion.getOrElse(return)
    commitManifest(v + 1, writeDataFiles(readVersion(v)))
  }

  /** Reclaim files referenced by no retained manifest: crashed-commit
    * orphans and data aged out of the last `keepVersions` snapshots. */
  def vacuum(keepVersions: Int = 2): Unit = {
    val v = currentVersion.getOrElse(return)
    val keep = ((v - keepVersions + 1) max 1L) to v
    val referenced = keep.flatMap(readManifest).toSet
    // drop manifests older than the retention window
    val dir = new Path(commitsDir)
    fs.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("v") && n.endsWith(".manifest") &&
          n.stripPrefix("v").stripSuffix(".manifest").toLong < keep.head)
        fs.delete(st.getPath, false)
    }
    // delete unreferenced data files, then empty partition dirs
    val root = new Path(dataDir)
    if (!fs.exists(root)) return
    def sweep(p: Path, rel: String): Boolean = { // returns "now empty"
      var empty = true
      fs.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        val childRel = if (rel.isEmpty) name else s"$rel/$name"
        if (st.isDirectory) {
          if (sweep(st.getPath, childRel)) fs.delete(st.getPath, false)
          else empty = false
        } else if (!referenced(childRel)) fs.delete(st.getPath, false)
        else empty = false
      }
      empty
    }
    sweep(root, "")
    fs.delete(new Path(s"$path/_stage"), true)
  }
}

object SnapshotTable {
  def apply(spark: SparkSession, path: String, primaryKey: String,
            partitionCol: Option[String] = None,
            declaredSchema: Option[StructType] = None): SnapshotTable =
    new SnapshotTable(spark, path, primaryKey, partitionCol, declaredSchema)
}
