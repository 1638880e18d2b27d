package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Event-time windowed aggregation over streams — the standard
  * Structured Streaming shape (watermark + tumbling window + grouped
  * aggregate) the engine offers beyond the reference's batch-only
  * surface (SURVEY.md §2.10: the reference has no event-time operators;
  * its late/duplicate handling is MERGE-by-PK, which [[Ingest]] keeps).
  *
  * Scale notes (100 TB): state is bounded by the watermark — expired
  * windows are evicted from the state store; the aggregate itself is the
  * usual partial/final pair per micro-batch, sharded by group key across
  * executors.
  */
object WindowedAgg {

  /** Tumbling event-time aggregate, complete-mode snapshot semantics:
    * each micro-batch rewrites the full aggregate; after AvailableNow
    * drains the source, `outDir` holds the same result a batch
    * aggregation of all input would give (stream-batch parity). */
  def tumblingComplete(spark: SparkSession, sourceDir: String,
                       tsCol: Column, keyCol: String, valueCol: String,
                       windowLen: String, outDir: String,
                       checkpointDir: String,
                       schema: org.apache.spark.sql.types.StructType): Unit = {
    val q = spark.readStream.schema(schema).parquet(sourceDir)
      .withColumn("__ts", tsCol)
      .groupBy(window(col("__ts"), windowLen), col(keyCol))
      .agg(count(lit(1)).as("cnt"), sum(col(valueCol)).as("total"))
      .writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch
          .select(
            // full timestamp label (like tumblingAppend): a bare date
            // would collapse every sub-daily window of a key into
            // indistinguishable duplicate rows
            date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
              .as("window_start"),
            col(keyCol), col("cnt"), round(col("total"), 2).as("total"))
          .write.mode("overwrite").parquet(outDir)
      }
      .start()
    q.awaitTermination()
  }

  /** Append-mode variant with a real watermark: only FINALIZED windows
    * (watermark passed their end) are emitted, to a native file sink;
    * rows arriving later than `delay` behind the max seen event time are
    * dropped. The trailing open window stays in state and is never
    * emitted by AvailableNow — by design (that is what append means). */
  def tumblingAppend(spark: SparkSession, sourceDir: String,
                     schema: org.apache.spark.sql.types.StructType,
                     tsCol: Column, keyCol: String,
                     windowLen: String, delay: String, outDir: String,
                     checkpointDir: String,
                     maxFilesPerTrigger: Int = 1): Unit = {
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
      .withColumn("__ts", tsCol)
      .withWatermark("__ts", delay)
      .groupBy(window(col("__ts"), windowLen), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col(keyCol), col("cnt"))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
