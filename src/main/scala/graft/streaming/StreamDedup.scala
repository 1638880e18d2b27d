package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming exactly-once-per-key dedup for at-least-once sources:
  * `dropDuplicatesWithinWatermark` keeps the first-arriving row per key
  * and drops re-deliveries for as long as a key can still legally
  * re-arrive (the watermark). State is therefore BOUNDED — O(keys per
  * watermark window), not O(stream history) — the property that makes
  * streaming dedup viable on an unbounded 100 TB/day feed, where the
  * batch alternative (re-running exact dedup over the accumulated
  * corpus) is O(history) per refresh.
  *
  * Complements the batch dedup family in
  * [[graft.operators.TextDedup]] / [[graft.operators.Dedup]]: same
  * keep-first semantics, incremental execution.
  */
object StreamDedup {

  /** Drain `landingDir` (parquet file-arrival source) with AvailableNow,
    * drop re-delivered keys, append survivors to `outDir`. The sink is
    * append-mode parquet: each first-seen key is emitted exactly once,
    * so the sink accumulates the deduped stream. */
  def dedupToParquet(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      keyCol: String,
      eventTimeCol: String,
      watermark: String,
      outDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    val r = spark.readStream.schema(schema)
    val src = maxFilesPerTrigger
      .fold(r)(n => r.option("maxFilesPerTrigger", n))
      .parquet(landingDir)
    val q = src
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCol)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
