package graft

import org.apache.spark.sql.SparkSession

/** Shared plumbing for the two gate mains ([[Verify]], [[Bench]]) —
  * ONE session recipe and ONE JSON escaper, so a conf or format fix
  * can't land in one gate and silently diverge the other. */
private[graft] object Gate {

  /** The gate SparkSession: local[n], pinned shuffle parallelism, UTC. */
  def session(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      // AQE coalescing knobs (optimization guide §2.2/§9), env-tunable,
      // DEFAULTS = Spark defaults. r18 measured size-first coalescing
      // (parallelismFirst=false) against the default on mixed and
      // DML-heavy subsets and two full sweeps: a wash in both
      // directions at this box's shapes — tiny shuffles save task
      // scheduling, CPU-heavy small-byte DML stages lose parallelism,
      // net zero. Defaults keep the committed bench comparable across
      // rounds; a cluster deployment should set
      // SPARK_GRAFT_AQE_PARALLELISM_FIRST=false and raise the advisory
      // to 128-256m (guide §9) so partition counts derive from runtime
      // bytes rather than defaultParallelism.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PARTITION", "64m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // raw local FS, no client-side .crc siblings: production filesystems
      // (HDFS, S3A) don't write them either, and ChecksumFileSystem DOUBLES
      // every metadata op on many-partition writes (measured ~30% on a
      // 2,400-dir write) — this makes local[n] behave like a cluster
      .config("spark.hadoop.fs.file.impl",
        "org.apache.hadoop.fs.RawLocalFileSystem")
      // column-id-mapped tables (graft.columnMapping='id') resolve
      // parquet columns by field id — required for RENAME/DROP COLUMN
      // correctness; a no-op for schemas without ids
      .config("spark.sql.parquet.fieldId.read.enabled", "true")
      // write timestamps as INT64 micros, not the Spark-default legacy
      // INT96: 4 fewer bytes per value, and INT96 chunks carry NO
      // usable footer stats — with MICROS every timestamp column in
      // statsCols gets "T:" min/max in the manifest, which is what
      // makes time-range scans (the dominant 100 TB pattern) skip
      // files instead of opening them
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** JSON string literal: backslash, quote, and ALL control chars
    * (<0x20) escaped — a tab or CR in builder-authored SQL (or a
    * quote in a path) would otherwise make the driver's json.load
    * fail and silently zero the round's artifact. */
  def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
