package graft.plans

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  * with a staging-dir swap.
  */
final class LakehouseTable(
    spark: SparkSession,
    val path: String,
    val primaryKey: String,
    val partitionCol: Option[String] = None) {

  private def fs: FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** S3# — existence probe (reference: DeltaTable.isDeltaTable,
    * orders_etl.py:65). */
  def exists: Boolean = {
    val p = new Path(path)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      st.getPath.getName != "_SUCCESS" && !st.getPath.getName.startsWith(".")
    }
  }

  /** S2 — snapshot scan of the current table state. */
  def read: DataFrame = spark.read.parquet(path)

  /** K1 — initial partitioned create (reference: orders_etl.py:74). */
  def create(df: DataFrame): Unit = {
    val w = df.write.mode("overwrite")
    partitionCol.fold(w)(c => w.partitionBy(c)).parquet(path)
  }

  /** K2 — MERGE upsert. Source must be PK-unique (the reference dedups
    * immediately before merging, orders_etl.py:59-71; multi-row-per-key
    * merge behavior is unspecified there, SURVEY.md §7.3). */
  def upsert(source: DataFrame): Unit = {
    if (!exists) { create(source); return }
    partitionCol match {
      case Some(pc) => upsertPartitionScoped(source, pc)
      case None     => upsertFull(source)
    }
  }

  /** Partition-scoped merge: prune target read + rewrite to the partitions
    * present in the source batch. */
  private def upsertPartitionScoped(source: DataFrame, pc: String): Unit = {
    val src = source.persist()
    try {
      val touched = src.select(pc).distinct().collect().map(_.get(0))
      val targetSlice = read.filter(col(pc).isin(touched.toSeq: _*))
      val merged = targetSlice
        .join(src.select(primaryKey), Seq(primaryKey), "left_anti")
        .unionByName(src)
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try merged.write.mode("overwrite").partitionBy(pc).parquet(path)
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    } finally src.unpersist()
  }

  /** Global merge via staging-dir swap (works for unpartitioned tables and
    * PKs that may migrate partitions). The swap keeps readers consistent:
    * we never overwrite a directory we are concurrently scanning. */
  def upsertFull(source: DataFrame): Unit = {
    if (!exists) { create(source); return }
    val merged = read
      .join(source.select(primaryKey), Seq(primaryKey), "left_anti")
      .unionByName(source)
    val staging = path + ".staging"
    val w = merged.write.mode("overwrite")
    partitionCol.fold(w)(c => w.partitionBy(c)).parquet(staging)
    val p = new Path(path); val s = new Path(staging)
    fs.delete(p, true)
    if (!fs.rename(s, p))
      throw new IllegalStateException(s"staging swap failed: $staging -> $path")
  }

  /** S4 — register in the session catalog so `spark.sql` resolves the
    * table by name (the reference's Glue-crawler + Athena path,
    * SURVEY.md §3.3 — our catalog updates synchronously, no crawler). */
  def registerAs(name: String): Unit =
    read.createOrReplaceTempView(name)
}

object LakehouseTable {
  def apply(spark: SparkSession, path: String, primaryKey: String,
            partitionCol: Option[String] = None): LakehouseTable =
    new LakehouseTable(spark, path, primaryKey, partitionCol)
}
