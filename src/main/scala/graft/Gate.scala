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
      .config("spark.sql.shuffle.partitions", cpus)
      // Size-first AQE coalescing (optimization guide §2.2): with the
      // default parallelismFirst=true, AQE deliberately ignores the
      // advisory partition size and keeps ~defaultParallelism tasks per
      // shuffle — on the gate's small-shuffle entries that is pure
      // per-task scheduling overhead (TailProbe: repeat-action, i.e.
      // execution, is 60–90% of the sub-second tail), and at cluster
      // scale Spark's own docs recommend parallelismFirst=false so
      // partitions land near the advisory size. The advisory size is
      // env-tunable (SPARK_GRAFT_ADVISORY_PARTITION, bytes-string) with
      // Spark's 64m default — a cluster deployment would raise it to
      // 128–256m per guide §9; the SETTING is scale-adaptive by
      // construction (AQE derives partition counts from runtime bytes,
      // not from a constant tuned to either width).
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
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
