package graft.streaming

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("k", StringType),
    StructField("v", DoubleType)))

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_stream_$tag").toString

  private def writeOneFile(rows: Seq[(String, String, Double)], dir: String,
                           name: String, mtimeSec: Long): Unit = {
    val stage = tmp("stage")
    rows.toDF("ts", "k", "v")
      .select(col("ts").cast(TimestampType).as("ts"), col("k"), col("v"))
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val part = Files.list(Paths.get(stage)).toArray.map(_.toString)
      .find(_.endsWith(".parquet")).get
    val dst = Paths.get(dir, name)
    Files.copy(Paths.get(part), dst)
    Files.setLastModifiedTime(dst, FileTime.fromMillis(mtimeSec * 1000))
  }

  test("append-mode windowed agg emits only watermark-finalized windows") {
    val landing = tmp("landing"); val out = tmp("out"); val cp = tmp("cp")
    writeOneFile(Seq(
      ("2024-01-01 10:00:00", "a", 1.0),
      ("2024-01-01 11:00:00", "a", 1.0),
      ("2024-01-02 12:00:00", "b", 1.0)), landing, "0.parquet", 1000000)
    WindowedAgg.tumblingAppend(spark, landing, schema, col("ts"), "k",
      "1 day", "1 hour", out, cp)
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // day-1 window finalized (watermark = Jan2 12:00 - 1h > Jan2 00:00);
    // day-2 window still open -> withheld
    assert(got == Set(("2024-01-01 00:00:00", "a", 2L)))
  }

  test("append-mode windowed agg drops rows later than the watermark") {
    val landing = tmp("landing2"); val out = tmp("out2"); val cp = tmp("cp2")
    // drain 1: day-2 data advances the persisted watermark past day 1
    writeOneFile(Seq(("2024-01-02 12:00:00", "b", 1.0)),
      landing, "0.parquet", 1000000)
    WindowedAgg.tumblingAppend(spark, landing, schema, col("ts"), "k",
      "1 day", "1 hour", out, cp)
    // drain 2 (same checkpoint -> watermark recovered): a day-1
    // straggler arrives, now behind the watermark
    writeOneFile(Seq(("2024-01-01 09:00:00", "late", 1.0)),
      landing, "1.parquet", 1000100)
    WindowedAgg.tumblingAppend(spark, landing, schema, col("ts"), "k",
      "1 day", "1 hour", out, cp)
    val got = spark.read.parquet(out).collect().map(_.getString(1)).toSet
    assert(!got.contains("late"), s"late row leaked into output: $got")
  }

  test("complete-mode windowed agg equals batch aggregation after drain") {
    val landing = tmp("landing3"); val out = tmp("out3"); val cp = tmp("cp3")
    writeOneFile(Seq(
      ("2024-01-01 10:00:00", "a", 2.0),
      ("2024-01-01 11:00:00", "b", 3.0),
      ("2024-01-02 12:00:00", "a", 4.0)), landing, "0.parquet", 1000000)
    WindowedAgg.tumblingComplete(spark, landing, col("ts"), "k", "v",
      "1 day", out, cp, schema)
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // full window-START labels: a bare date would collapse sub-daily
    // windows of one key into indistinguishable duplicate rows
    assert(got == Set(
      ("2024-01-01 00:00:00", "a", 1L, 2.0),
      ("2024-01-01 00:00:00", "b", 1L, 3.0),
      ("2024-01-02 00:00:00", "a", 1L, 4.0)))
  }
}
