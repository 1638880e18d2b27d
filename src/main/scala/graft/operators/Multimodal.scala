package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: media
  * payloads travel as opaque `binary` columns next to typed metadata;
  * decode / feature-extraction runs batched per partition.
  *
  * The actual byte→pixels/samples decode is STUBBED (no image/audio
  * codecs in this build): `stubDecode*` derive deterministic fake
  * outputs from the bytes, clearly marked below. Everything around the
  * stub — schema, binary handling, partition-level batching, output
  * shape — is real Spark plumbing and is what matters at 100 TB: media
  * bytes never pass through the driver, decode parallelism is partition
  * parallelism, and metadata-only queries prune the binary column out of
  * the scan entirely (columnar projection).
  */
object Multimodal {

  /** Typed metadata carried beside the payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = false))), nullable = false)))

  /** Wrap any (id, string-payload) frame into the media shape —
    * deterministic fake payloads for testing the plumbing. */
  def syntheticMedia(df: DataFrame, idCol: String, payloadCol: String,
                     sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast(IntegerType)).as("kind"),
      encode(col(payloadCol), "UTF-8").as("bytes"),
      struct(
        col(sourceCol).as("source"),
        length(encode(col(payloadCol), "UTF-8")).cast(LongType).as("n_bytes"))
        .as("meta"))

  /** ---- STUB ---- deterministic fake "decode": image dimensions and a
    * checksum derived from the byte length/content, standing in for a
    * real codec. Column algebra only, so the plumbing (batch shape,
    * pruning, partitioning) is identical to what a real decoder UDF
    * would see. */
  def stubDecodeImage(bytes: org.apache.spark.sql.Column) = struct(
    (pmod(length(bytes), lit(640)) + 1).cast(IntegerType).as("width"),
    (pmod(length(bytes), lit(480)) + 1).cast(IntegerType).as("height"),
    crc32(bytes).as("checksum"))

  /** ---- STUB ---- "frame sampling" for video payloads: split the byte
    * stream into fixed-size chunks and keep every `stride`-th — the
    * partitioning/batching shape of real frame extraction (chunk = a
    * fake frame; a real demuxer would find frame boundaries instead). */
  def stubSampleFrames(bytes: org.apache.spark.sql.Column, chunk: Int,
                       stride: Int): org.apache.spark.sql.Column = {
    val n = ceil(length(bytes).cast("double") / chunk).cast("int")
    val frames = filter(
      transform(sequence(lit(0), n - 1),
        i => struct(i.as("frame_no"),
          bytes.substr(i * chunk + 1, lit(chunk)).as("frame_bytes"))),
      f => pmod(f.getField("frame_no"), lit(stride)) === 0)
    // empty payload: n = 0 would make sequence(0, -1) DESCEND to [0, -1]
    // and emit phantom frames — return an empty frame list instead
    when(n > 0, frames)
      .otherwise(expr("CAST(array() AS ARRAY<STRUCT<frame_no: INT, frame_bytes: BINARY>>)"))
  }

  /** Feature extraction over media batches via `mapPartitions` — the
    * genuine per-partition imperative path a real decoder would use
    * (decode library invoked once per batch, not per row). The feature
    * vector itself is a ---- STUB ----: a deterministic 8-dim projection
    * of the payload bytes. */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "kind", "bytes").mapPartitions { rows =>
      // per-partition setup (a real impl would open the codec here, once)
      rows.map { r =>
        val id = r.getLong(0)
        val kind = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        // ---- STUB ---- deterministic fake features from byte content
        val feats = Array.tabulate(8) { i =>
          var acc = 1125899906842597L
          var j = i
          while (j < bytes.length) { acc = 31 * acc + bytes(j); j += 8 }
          ((acc & 0xFFFFL).toFloat / 65536.0f) - 0.5f
        }
        Row(id, kind, feats.toSeq)
      }
    }(enc)
  }
}
