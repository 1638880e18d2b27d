package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.Base64

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.util.sketch.BloomFilter

/** Per-group Bloom-filter sketches as typed `Aggregator` UDAFs — the
  * engine's §2.11 surface (the reference has no UDAFs; this is the one
  * aggregation Spark's built-ins genuinely cannot express).
  *
  * [[graft.plans.SnapshotTable]] uses these to build ONE bloom per data
  * file per indexed column in a single distributed pass
  * (`groupBy(input_file_name())`) — the Delta-style file-level bloom
  * index, with no writer hook required. Point-lookup pruning on a
  * high-cardinality, non-clustered column is exactly the case min/max
  * stats cannot help with (every file's [min, max] spans the probe key).
  *
  * The aggregation buffer is the mutable `BloomFilter` itself: updates
  * mutate it in place, and (de)serialization happens only at partial/
  * merge shuffle boundaries — one sketch per file per partition, never
  * per row. */
object BloomSketch {

  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  def toBase64(bf: BloomFilter): String =
    Base64.getEncoder.encodeToString(serialize(bf))

  def fromBase64(s: String): BloomFilter =
    deserialize(Base64.getDecoder.decode(s))

  private final class LongBloomAgg(expectedItems: Long, fpp: Double)
      extends Aggregator[java.lang.Long, BloomFilter, Array[Byte]] {
    def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)
    def reduce(b: BloomFilter, v: java.lang.Long): BloomFilter = {
      if (v != null) b.putLong(v.longValue)
      b
    }
    def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
      a.mergeInPlace(b)
      a
    }
    def finish(b: BloomFilter): Array[Byte] = serialize(b)
    def bufferEncoder: Encoder[BloomFilter] = Encoders.javaSerialization[BloomFilter]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private final class StringBloomAgg(expectedItems: Long, fpp: Double)
      extends Aggregator[String, BloomFilter, Array[Byte]] {
    def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)
    def reduce(b: BloomFilter, v: String): BloomFilter = {
      if (v != null) b.putString(v)
      b
    }
    def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
      a.mergeInPlace(b)
      a
    }
    def finish(b: BloomFilter): Array[Byte] = serialize(b)
    def bufferEncoder: Encoder[BloomFilter] = Encoders.javaSerialization[BloomFilter]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Bloom over an integral column (cast to long first). Nulls are
    * skipped — a bloom answers "might contain VALUE", null-ness is the
    * stats' job. */
  def longBloom(c: Column, expectedItems: Long, fpp: Double): Column =
    udaf(new LongBloomAgg(expectedItems, fpp), Encoders.LONG).apply(c)

  /** Bloom over a string column. */
  def stringBloom(c: Column, expectedItems: Long, fpp: Double): Column =
    udaf(new StringBloomAgg(expectedItems, fpp), Encoders.STRING).apply(c)
}
