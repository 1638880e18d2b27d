package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Cross-batch and cross-restart dedup state: a key re-delivered in a
  * LATER drain (new process, same checkpoint) must still be dropped —
  * the state lives in the checkpoint, not the run. */
class StreamDedupSpec extends SparkSpec {

  import spark.implicits._

  test("re-delivery in a later drain is dropped; new keys still pass") {
    val base = Files.createTempDirectory("graft_sdedup").toString
    val landing = s"$base/landing"
    def batch(rows: (Long, String)*) = rows.toDF("id", "v")
      .withColumn("ets", to_timestamp(lit("2024-01-15 12:00:00")))
    val schema = batch((0L, "x")).schema

    batch((1L, "a"), (2L, "b")).write.mode("append").parquet(landing)
    StreamDedup.dedupToParquet(spark, landing, schema, "id", "ets",
      "3650 days", s"$base/out", s"$base/ckpt")
    assert(spark.read.parquet(s"$base/out").count() == 2)

    // second drain: one re-delivery (different payload — first wins),
    // one genuinely new key
    batch((2L, "B-REDELIVERED"), (3L, "c")).write.mode("append").parquet(landing)
    StreamDedup.dedupToParquet(spark, landing, schema, "id", "ets",
      "3650 days", s"$base/out", s"$base/ckpt")
    val out = spark.read.parquet(s"$base/out")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq(1L -> "a", 2L -> "b", 3L -> "c"),
      s"cross-restart dedup state failed: $out")
  }
}
