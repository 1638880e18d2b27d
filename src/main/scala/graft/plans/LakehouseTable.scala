package graft.plans

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** A partitioned-parquet "lakehouse" table with MERGE-by-PK upsert — the
  * pure-Spark re-expression of the reference's Delta tables (K1/K2/S2/S3;
  * reference: orders_etl.py:59-74, product_etl.py:57-72,
  * order_items_etl.py:94-109; emulation design in SURVEY.md §7.3 — no
  * Delta jar in this build).
  *
  * Semantics preserved from Delta MERGE (orders_etl.py:67-71): match on
  * PK; matched target rows fully replaced by source; unmatched source rows
  * inserted; unmatched target rows kept. Idempotent re-processing of the
  * same batch is a no-op by construction.
  *
  * Scale notes (100 TB): `upsert` is partition-scoped — only the
  * partitions the source batch touches are read (partition-pruned scan)
  * and rewritten (dynamic partition overwrite). A daily batch against a
  * date-partitioned 100 TB table therefore costs O(batch partitions), not
  * O(table). The anti-join shuffles on the PK only within those
  * partitions; with a small batch Catalyst broadcasts the source side.
  * This relies on the PK→partition mapping being stable across batches
  * (true for the reference: `date` is derived from the row itself). For
  * keys that can migrate partitions, `upsertFull` does the global merge
  * with a crash-safe staging swap.
  *
  * Consistency model: dynamic partition overwrite commits per partition,
  * so a mid-job crash can leave a subset of TOUCHED partitions rewritten —
  * weaker than Delta's atomic commit. Re-running the same batch repairs
  * the table (the merge is idempotent); that retry-until-success model is
  * exactly the reference's (3 retries per job,
  * step_functions.json:14-23). `upsertFull` keeps a `.backup` of the live
  * directory until the swap completes, so no failure window loses data.
  */
final class LakehouseTable(
    spark: SparkSession,
    val path: String,
    val primaryKey: String,
    val partitionCol: Option[String] = None,
    val declaredSchema: Option[StructType] = None) {

  private def fs: FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** S3# — existence probe (reference: DeltaTable.isDeltaTable,
    * orders_etl.py:65). Runs crash recovery first: a death between the
    * two swap renames leaves live missing but `.backup` present — naive
    * `!exists` would let the next upsert silently rebuild the table from
    * one batch and later delete the stranded backup (= full data loss).
    * Restoring the backup here makes "retry the batch" actually repair. */
  def exists: Boolean = {
    recoverFromCrash()
    val p = new Path(path)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      st.getPath.getName != "_SUCCESS" && !st.getPath.getName.startsWith(".")
    }
  }

  private def recoverFromCrash(): Unit = {
    val p = new Path(path)
    val b = new Path(path + ".backup")
    if (!fs.exists(p) && fs.exists(b)) {
      if (!fs.rename(b, p))
        throw new IllegalStateException(
          s"crash recovery failed: cannot restore $b to $p")
    }
  }

  /** S2 — snapshot scan of the current table state. Reads with the
    * declared schema when given, so a string partition column (the
    * reference's `date`) is not silently re-inferred as DateType and the
    * table schema never drifts across upsert round-trips. */
  def read: DataFrame = declaredSchema match {
    case Some(s) => spark.read.schema(s).parquet(path)
    case None    => spark.read.parquet(path)
  }

  /** Cluster rows by the partition column before a partitioned write:
    * without this, every one of the N shuffle partitions can hold rows of
    * every table partition, producing up to N files PER partition dir
    * (measured: a 2,500-date create wrote ~80k tiny files — the classic
    * small-files scale-killer). After clustering each partition dir gets
    * one file per holding task.
    *
    * The partition COUNT is pinned to the session's shuffle parallelism:
    * a bare `repartition(col)` is AQE-coalescible, and a small batch over
    * many table partitions collapses to ONE task that then pays every
    * per-directory committer/file round-trip sequentially (measured at
    * the pipeline's 2,400-date shape: 38s collapsed vs 7s pinned, same
    * one-file-per-dir layout — each key still hashes to exactly one
    * task). Skew caveat: one giant partition value lands on one task;
    * callers with known skew should pre-salt. */
  private def clustered(df: DataFrame): DataFrame =
    partitionCol.fold(df)(c => df.repartition(
      spark.sessionState.conf.numShufflePartitions, col(c)))

  /** K1 — initial partitioned create (reference: orders_etl.py:74). */
  def create(df: DataFrame): Unit = {
    val w = clustered(df).write.mode("overwrite")
    partitionCol.fold(w)(c => w.partitionBy(c)).parquet(path)
  }

  /** K2 — MERGE upsert. Source must be PK-unique (the reference dedups
    * immediately before merging, orders_etl.py:59-71; multi-row-per-key
    * merge behavior is unspecified there, SURVEY.md §7.3).
    *
    * @param evolveSchema allow the source to carry NEW columns: kept
    *   target rows get nulls for them (Delta's mergeSchema analog).
    *   Old files stay as-is; reads see the new column as null once the
    *   caller's declared schema includes it. */
  def upsert(source: DataFrame, evolveSchema: Boolean = false): Unit = {
    if (!exists) { create(source); return }
    partitionCol match {
      case Some(pc) => upsertPartitionScoped(source, pc, evolveSchema)
      // existence was just probed — skip upsertFull's re-check (each
      // exists is several metadata round-trips, network calls on an
      // object store)
      case None     => upsertFullExisting(source, evolveSchema)
    }
  }

  /** Max touched-partition values inlined as an `isin` literal list for
    * static partition pruning; above this the target slice is pruned by a
    * broadcast semi-join instead (dynamic partition pruning), keeping the
    * driver out of the data path at high partition cardinality. */
  private val IsinPruneLimit = 1000

  /** Partition-scoped merge: prune the target read + rewrite to only the
    * partitions present in the source batch. Overwrite mode is set
    * per-write (option, not session conf) so concurrent writers in the
    * same session are unaffected. */
  private def upsertPartitionScoped(source: DataFrame, pc: String,
                                    evolveSchema: Boolean = false): Unit = {
    val src = source.persist()
    try {
      val touched = src.select(pc).distinct().limit(IsinPruneLimit + 1).collect()
      // null partition values need explicit handling: isin and an
      // equi-semi-join never match null, but dynamic overwrite still
      // rewrites the null partition — without this the merge would
      // replace existing null-partition rows with source-only rows
      val targetSlice =
        if (touched.length <= IsinPruneLimit) {
          val (nullVals, vals) = touched.toSeq.partition(_.isNullAt(0))
          val base = col(pc).isin(vals.map(_.get(0)): _*)
          read.filter(if (nullVals.nonEmpty) base || col(pc).isNull else base)
        } else {
          // EqualTo, not <=>: Spark's PartitionPruning rule only
          // matches null-unsafe equality, so a null-safe join here
          // silently defeated the dynamic partition pruning this
          // branch exists for (O(table) scan in the high-cardinality
          // regime). The null partition — which equi-joins never
          // match — is handled by an explicit disjunct instead.
          val srcParts = broadcast(
            src.select(col(pc).as("__src_pc"))
              .filter(col("__src_pc").isNotNull).distinct())
          val nonNull = read.join(srcParts,
            col(pc) === col("__src_pc"), "left_semi")
          if (src.filter(col(pc).isNull).isEmpty) nonNull
          else nonNull.unionByName(read.filter(col(pc).isNull))
        }
      // Append fast path: a batch whose PKs are ALL new (the steady state
      // for streaming ingest of immutable events) needs no rewrite at all —
      // just add files to the touched partitions. The overlap probe reads
      // only the pruned PK column, far cheaper than the full-width rewrite
      // it avoids. Retrying a crashed/duplicated batch is still safe: the
      // PKs then exist, so the retry takes the merge path, whose anti-join
      // collapses the duplicates. Appended small files are reclaimed by
      // `compact()`.
      // null-SAFE key joins throughout the merge: a null-PK row must
      // match an existing null-PK row, or re-running the same batch
      // appends one more copy every time — breaking the documented
      // idempotency. (Hash joins support EqualNullSafe keys; only the
      // partition-prune join above needs EqualTo for DPP.)
      val srcKeys = src.select(col(primaryKey).as("__src_pk"))
      val overlaps = !targetSlice.select(primaryKey)
        .join(srcKeys, col(primaryKey) <=> col("__src_pk"), "left_semi")
        .isEmpty
      if (!overlaps) {
        val out =
          if (evolveSchema) src
          else src.select(targetSlice.columns.toIndexedSeq.map(col): _*)
        clustered(out).write.mode("append").partitionBy(pc).parquet(path)
      } else {
        val kept = targetSlice.join(srcKeys,
          col(primaryKey) <=> col("__src_pk"), "left_anti")
        val merged =
          if (evolveSchema) kept.unionByName(src, allowMissingColumns = true)
          else kept.unionByName(src.select(targetSlice.columns.toIndexedSeq.map(col): _*))
        clustered(merged).write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(pc).parquet(path)
      }
    } finally src.unpersist()
  }

  /** Global merge via a crash-safe staging swap (works for unpartitioned
    * tables and PKs that may migrate partitions). Swap order: write
    * staging → rename live to `.backup` → rename staging to live → drop
    * backup. A failure at any point leaves either the old table or both
    * directories on disk — never a window with no data (the round-1
    * delete-then-rename had one). */
  def upsertFull(source: DataFrame, evolveSchema: Boolean = false): Unit = {
    if (!exists) { create(source); return }
    upsertFullExisting(source, evolveSchema)
  }

  private def upsertFullExisting(source: DataFrame,
                                 evolveSchema: Boolean): Unit = {
    // null-safe anti-join: see upsertPartitionScoped — a null-PK row
    // must replace an existing null-PK row, not accumulate
    val kept = read.join(
      source.select(col(primaryKey).as("__src_pk")),
      col(primaryKey) <=> col("__src_pk"), "left_anti")
    val merged =
      if (evolveSchema) kept.unionByName(source, allowMissingColumns = true)
      else kept.unionByName(source.select(read.columns.toIndexedSeq.map(col): _*))
    writeStagingAndSwap(merged)
  }

  /** OPTIMIZE analog: rewrite the table clustered by the partition
    * column, collapsing accumulated small files (every incremental
    * upsert adds at least one file per touched partition) back to one
    * file per partition-holding task. O(table) — schedule it like any
    * compaction, not per batch. Crash-safe via the same staging swap. */
  def compact(): Unit = {
    if (!exists) return
    writeStagingAndSwap(read)
  }

  /** Write `df` to a staging dir, then swap: live → `.backup`, staging →
    * live, drop backup; restore on failure. Never a window with no
    * table. */
  private def writeStagingAndSwap(df: DataFrame): Unit = {
    val staging = path + ".staging"
    val backup = path + ".backup"
    val w = clustered(df).write.mode("overwrite")
    partitionCol.fold(w)(c => w.partitionBy(c)).parquet(staging)
    val p = new Path(path); val s = new Path(staging); val b = new Path(backup)
    fs.delete(b, true)
    if (!fs.rename(p, b))
      throw new IllegalStateException(s"backup rename failed: $path -> $backup")
    if (!fs.rename(s, p)) {
      fs.rename(b, p) // restore
      throw new IllegalStateException(s"staging swap failed: $staging -> $path")
    }
    fs.delete(b, true)
  }

  /** S4 — register in the session catalog so `spark.sql` resolves the
    * table by name (the reference's Glue-crawler + Athena path,
    * SURVEY.md §3.3 — our catalog updates synchronously, no crawler). */
  def registerAs(name: String): Unit =
    read.createOrReplaceTempView(name)

  /** S4 — PERSISTENT catalog registration: an external datasource table
    * (`CREATE TABLE ... USING parquet LOCATION`) that outlives the
    * session, like the reference's Glue Catalog tables outlive the job
    * (step_functions.json:115-130) — unlike [[registerAs]]'s session
    * temp view. For partitioned tables the metastore partition list is
    * recovered from the directory layout (the crawler's job, done
    * synchronously); re-running after an upsert refreshes it, so call
    * this again after writes that add partitions. Backed by the
    * catalog the session is configured with (in-memory per-JVM here;
    * an external metastore in a real deployment). */
  def registerPersistent(name: String): Unit = {
    // escape the interpolations: a path with an apostrophe or a name
    // with a backtick (both legal on HDFS/S3/POSIX) would otherwise
    // break — or truncate — the statement
    val qName = name.replace("`", "``")
    val qPath = path.replace("'", "\\'")
    if (!spark.catalog.tableExists(name)) {
      spark.sql(s"CREATE TABLE `$qName` USING parquet LOCATION '$qPath'")
    }
    spark.sql(s"REFRESH TABLE `$qName`")
    if (partitionCol.isDefined) spark.sql(s"MSCK REPAIR TABLE `$qName`")
  }
}

object LakehouseTable {
  def apply(spark: SparkSession, path: String, primaryKey: String,
            partitionCol: Option[String] = None,
            declaredSchema: Option[StructType] = None): LakehouseTable =
    new LakehouseTable(spark, path, primaryKey, partitionCol, declaredSchema)
}
