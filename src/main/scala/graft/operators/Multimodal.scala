package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: media
  * payloads travel as opaque `binary` columns next to typed metadata;
  * decode / feature-extraction runs batched per partition.
  *
  * Three container formats are decoded FOR REAL, headers parsed from
  * the actual bytes with column algebra (no codec library needed for
  * container metadata): BMP ([[bmpBytes]]/[[decodeBmp]] — width/height/
  * bit-depth from the BITMAPINFOHEADER), WAV ([[wavBytes]]/
  * [[decodeWav]] — channels/sample-rate/bit-depth from the RIFF fmt
  * chunk) and PNG ([[pngBytes]]/[[decodePng]] — big-endian IHDR fields
  * with the chunk CRC32 recomputed and verified, not trusted).
  * PIXEL/SAMPLE decode is REAL for BMP, WAV and PNG: BMP pixel rows
  * and WAV PCM samples are plain bytes, and PNG's only compression is
  * DEFLATE — in the JDK — so [[bmpPixelStats]]/[[wavSampleStats]]/
  * [[pngPixelStats]] compute genuine per-channel / per-sample
  * statistics ([[pngEncode]]/[[pngPixelStats]] do the full
  * filter+DEFLATE round trip). Only JPEG pixel data (DCT) and video
  * demuxing remain STUBBED (those need codecs this build lacks):
  * `stubDecode*` derive deterministic fake outputs from the bytes,
  * clearly marked below.
  * Everything around the stubs — schema, binary handling,
  * partition-level batching, output shape — is real Spark plumbing and
  * is what matters at 100 TB: media bytes never pass through the
  * driver, decode parallelism is partition parallelism, and
  * metadata-only queries prune the binary column out of the scan
  * entirely (columnar projection).
  */
object Multimodal {

  import org.apache.spark.sql.Column

  // ---------------------------------------------------------------
  // real container formats: BMP + WAV, built and parsed byte-by-byte
  // ---------------------------------------------------------------

  /** Little-endian hex encoding of the low `nBytes` bytes of an
    * integral column (builds file headers as hex, one `unhex` at the
    * end). */
  private def leHex(c: Column, nBytes: Int): Column =
    concat((0 until nBytes).map(k =>
      lpad(hex(shiftright(c.cast(LongType), 8 * k).bitwiseAND(lit(255L))),
        2, "0")): _*)

  /** Little-endian unsigned read of `nBytes` bytes at 1-based `pos` of a
    * binary column (hex per byte, reassembled big-endian for conv). */
  private def leAt(b: Column, pos: Int, nBytes: Int): Column =
    conv(concat(((nBytes - 1) to 0 by -1).map(k =>
      hex(substring(b, pos + k, 1))): _*), 16, 10).cast(LongType)

  /** Int-range guard for 4-byte header fields: a corrupted or crafted
    * header whose top bit is set would make a bare Long→Int cast THROW
    * under ANSI mode and fail the whole scan — corruption must yield a
    * null field, not a job failure. */
  private def asInt(v: Column): Column =
    when(v <= Int.MaxValue, v).otherwise(lit(null)).cast(IntegerType)

  /** Tile `contentHex` (an even-length hex string, e.g. an md5 digest)
    * over `nBytes` payload bytes: repeat to cover, truncate exact.
    * The dynamic-count SQL `repeat` goes through [[call_function]] —
    * the Scala DSL only exposes the Int-literal overload. */
  private def tileHex(contentHex: Column, nBytes: Column): Column =
    substring(
      call_function("repeat", contentHex,
        ceil(nBytes.cast(DoubleType) * 2d / length(contentHex))
          .cast(IntegerType)),
      lit(1), (nBytes * 2).cast(IntegerType))

  /** Valid 24-bit uncompressed BMP bytes (BITMAPFILEHEADER +
    * BITMAPINFOHEADER + pixel rows, 4-byte row padding per the
    * format). Column algebra only — a per-row generated file. The
    * pixel area (INCLUDING the padding byte positions) is filled by
    * tiling `contentHex`, default zeros — pass e.g. `md5(...)` for
    * deterministic non-trivial pixels whose stats an oracle can
    * recompute byte-exactly. */
  def bmpBytes(width: Column, height: Column,
               contentHex: Column = lit("00")): Column = {
    val w = width.cast(LongType)
    val h = height.cast(LongType)
    val rowBytes = w * 3 + lit(3L) - pmod(w * 3 + lit(3L), lit(4L)) // pad to 4
    val imgSize = rowBytes * h
    val fileSize = imgSize + lit(54L)
    unhex(concat(
      lit("424D"), leHex(fileSize, 4), lit("00000000"), leHex(lit(54L), 4),
      leHex(lit(40L), 4), leHex(w, 4), leHex(h, 4),
      leHex(lit(1L), 2), leHex(lit(24L), 2), leHex(lit(0L), 4),
      leHex(imgSize, 4), leHex(lit(2835L), 4), leHex(lit(2835L), 4),
      leHex(lit(0L), 4), leHex(lit(0L), 4),
      tileHex(contentHex, imgSize)))
  }

  /** REAL BMP header decode: magic check + width/height/bit-depth/
    * declared file size read from the actual header bytes. Null for
    * non-BMP payloads. */
  def decodeBmp(bytes: Column): Column =
    when(length(bytes) >= 54 &&
         substring(bytes, 1, 2) === lit("BM".getBytes("US-ASCII")),
      struct(
        asInt(leAt(bytes, 19, 4)).as("width"),
        asInt(leAt(bytes, 23, 4)).as("height"),
        leAt(bytes, 29, 2).cast(IntegerType).as("bit_depth"),
        leAt(bytes, 3, 4).as("file_size")))

  /** Valid 16-bit PCM WAV bytes (RIFF/WAVE header + fmt + data chunk).
    * The sample area is filled by tiling `contentHex`, default zeros —
    * pass e.g. `md5(...)` for deterministic non-silent PCM whose
    * stats an oracle can recompute byte-exactly. */
  def wavBytes(sampleRate: Column, nSamples: Column,
               channels: Column = lit(1),
               contentHex: Column = lit("00")): Column = {
    val rate = sampleRate.cast(LongType)
    val ch = channels.cast(LongType)
    val dataSize = nSamples.cast(LongType) * ch * lit(2L)
    unhex(concat(
      lit("52494646"), leHex(dataSize + lit(36L), 4), lit("57415645"), // RIFF..WAVE
      lit("666D7420"), leHex(lit(16L), 4), // "fmt ", chunk size
      leHex(lit(1L), 2), leHex(ch, 2), leHex(rate, 4), // PCM, channels, rate
      leHex(rate * ch * lit(2L), 4), leHex(ch * lit(2L), 2), leHex(lit(16L), 2),
      lit("64617461"), leHex(dataSize, 4), // "data", size
      tileHex(contentHex, dataSize)))
  }

  /** REAL WAV header decode: RIFF/WAVE magic + channels/sample-rate/
    * bit-depth/data-size from the fmt and data chunks. Null for non-WAV
    * payloads. (Assumes the canonical 44-byte header layout emitted by
    * [[wavBytes]] and most encoders — fmt first, data second.) */
  def decodeWav(bytes: Column): Column =
    when(length(bytes) >= 44 &&
         substring(bytes, 1, 4) === lit("RIFF".getBytes("US-ASCII")) &&
         substring(bytes, 9, 4) === lit("WAVE".getBytes("US-ASCII")),
      struct(
        leAt(bytes, 23, 2).cast(IntegerType).as("channels"),
        asInt(leAt(bytes, 25, 4)).as("sample_rate"),
        leAt(bytes, 35, 2).cast(IntegerType).as("bit_depth"),
        leAt(bytes, 41, 4).as("data_size")))

  /** Big-endian unsigned read of `nBytes` at 1-based `pos` (PNG uses
    * network byte order — bytes hex out in order, no reversal). */
  private def beAt(b: Column, pos: Int, nBytes: Int): Column =
    conv(hex(substring(b, pos, nBytes)), 16, 10).cast(LongType)

  private def beHex(c: Column, nBytes: Int): Column =
    // mask to the low nBytes first: lpad TRUNCATES longer strings to
    // their LEADING chars, so an out-of-range value would otherwise
    // silently emit its high-order bytes into the header
    lpad(hex(c.cast(LongType)
      .bitwiseAND(lit((1L << (8 * nBytes)) - 1))), 2 * nBytes, "0")

  /** Structurally valid PNG signature + IHDR + empty IEND, with the
    * IHDR CRC32 COMPUTED over the real chunk bytes (column algebra via
    * `crc32` — headers round-trip through any PNG parser's integrity
    * check). 8-bit truecolor, no interlace. */
  def pngBytes(width: Column, height: Column): Column = {
    val ihdr = concat(lit("49484452"), beHex(width, 4), beHex(height, 4),
      lit("0802000000")) // bit depth 8, color type 2, std compression/filter/interlace
    unhex(concat(
      lit("89504E470D0A1A0A"), // signature
      lit("0000000D"), ihdr, beHex(crc32(unhex(ihdr)), 4),
      lit("0000000049454E44AE426082"))) // empty IEND + its fixed CRC
  }

  /** REAL PNG header decode: signature + IHDR magic, width/height/
    * bit-depth/color-type from the actual big-endian header bytes, and
    * the IHDR CRC RECOMPUTED and compared against the stored one
    * (`crc_ok`) — a corrupted header is detected, not trusted. Null for
    * non-PNG payloads. */
  def decodePng(bytes: Column): Column =
    when(length(bytes) >= 33 &&
         substring(bytes, 1, 8) === lit(Array(0x89, 0x50, 0x4E, 0x47,
           0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)) &&
         substring(bytes, 13, 4) === lit("IHDR".getBytes("US-ASCII")),
      struct(
        asInt(beAt(bytes, 17, 4)).as("width"),
        asInt(beAt(bytes, 21, 4)).as("height"),
        beAt(bytes, 25, 1).cast(IntegerType).as("bit_depth"),
        beAt(bytes, 26, 1).cast(IntegerType).as("color_type"),
        (crc32(substring(bytes, 13, 17)) === beAt(bytes, 30, 4)).as("crc_ok")))

  /** Big-endian unsigned read at a DYNAMIC 1-based position (the JPEG
    * segment walk advances by each segment's declared length). */
  private def beAtDyn(b: Column, pos: Column, nBytes: Int): Column =
    conv(hex(b.substr(pos.cast(IntegerType), lit(nBytes))), 16, 10)
      .cast(LongType)

  /** Structurally valid baseline JPEG bytes: SOI, an APP0/JFIF segment,
    * a COM segment, the SOF0 frame header carrying the real dimensions
    * (8-bit, 3 components, standard 4:2:0-ish sampling specs), an SOS
    * header (the JDK's reader refuses to report a frame without one),
    * and EOI. No entropy-coded data — this is the header surface a
    * metadata scanner reads; the SOF0 deliberately sits BEHIND two
    * other segments so decoding requires the real segment walk, not a
    * fixed offset. Width/height are 2-byte fields (≤ 65535). 69 bytes. */
  def jpegBytes(width: Column, height: Column): Column =
    unhex(concat(
      lit("FFD8"), // SOI
      lit("FFE000104A46494600010100004800480000"), // APP0: JFIF v1.1, 72dpi
      lit("FFFE000C6772616674206A706567"), // COM "graft jpeg"
      lit("FFC00011") /* SOF0, length 17 */, lit("08"), // precision 8
      beHex(height, 2), beHex(width, 2),
      lit("03"), lit("012200021101031101"), // 3 components + sampling specs
      lit("FFDA000C03011002110311003F00"), // SOS: 3 components, 0-63, no data
      lit("FFD9"))) // EOI

  /** 1-based offset of the SOF marker (SOF0/1/2 — baseline, extended,
    * progressive), found by walking the segment chain from after SOI:
    * each step reads the 2-byte marker and its big-endian length and
    * jumps past it. The walk is a bounded unroll of `maxSegments`
    * steps in pure column algebra; it stops (null) at EOI, at SOS —
    * past which lies entropy data, a frame header there would be
    * garbage — on a malformed marker byte, or off the end. Real-world
    * JPEGs put SOF behind a handful of APPn/DQT/DHT/COM segments, so a
    * fixed-offset read is wrong by construction. */
  def jpegSofOffset(bytes: Column, maxSegments: Int = 12): Column = {
    val init = struct(
      lit(3L).as("pos"), lit(null).cast(LongType).as("sof"))
    // the fold MUST be a higher-order `aggregate` (state = lambda
    // variable): a Scala-level foldLeft would inline the entire state
    // subtree at every one of its ~6 references per step — an
    // exponentially-sized Column tree by step 12
    val fin = aggregate(
      sequence(lit(1), lit(maxSegments)), init,
      (st, _) => {
        val pos = st.getField("pos")
        val sof = st.getField("sof")
        val m0 = beAtDyn(bytes, pos, 1)
        val m1 = beAtDyn(bytes, pos + 1, 1)
        val segLen = beAtDyn(bytes, pos + 2, 2)
        val isSof = m1.isin(0xC0L, 0xC1L, 0xC2L)
        val walking = sof.isNull && m0 === 0xFFL &&
          m1 =!= 0xD9L && m1 =!= 0xDAL && // EOI / SOS terminate the walk
          (pos + 3) <= length(bytes)
        struct(
          when(walking && !isSof, pos + 2 + segLen).otherwise(pos).as("pos"),
          when(walking && isSof, pos).otherwise(sof).as("sof"))
      })
    fin.getField("sof")
  }

  /** REAL JPEG frame-header decode: SOI magic check, then the segment
    * walk above locates SOF0/1/2 and width/height/precision/component
    * count are read from its actual big-endian bytes. Null for non-JPEG
    * payloads AND for corrupted ones whose segment chain no longer
    * reaches a frame header — corruption is detected, not trusted. */
  def decodeJpeg(bytes: Column): Column = {
    val sof = jpegSofOffset(bytes)
    when(length(bytes) >= 4 &&
         substring(bytes, 1, 2) ===
           lit(Array(0xFF, 0xD8).map(_.toByte)) && // SOI
         sof.isNotNull && (sof + 9) <= length(bytes),
      struct(
        asInt(beAtDyn(bytes, sof + 7, 2)).as("width"),
        asInt(beAtDyn(bytes, sof + 5, 2)).as("height"),
        asInt(beAtDyn(bytes, sof + 4, 1)).as("bit_depth"),
        asInt(beAtDyn(bytes, sof + 9, 1)).as("n_components")))
  }

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

  // ---------------------------------------------------------------
  // REAL pixel/sample decode: BMP + WAV (plain bytes) and PNG (the
  // "codec" is DEFLATE, which ships in the JDK — java.util.zip)
  // ---------------------------------------------------------------

  private def u8(bytes: Array[Byte], off: Int): Int = bytes(off) & 0xFF

  /** Little-endian unsigned read of `n` bytes at 0-based `off`. */
  private def leLong(bytes: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L; var k = n - 1
    while (k >= 0) { v = (v << 8) | (bytes(off + k) & 0xFFL); k -= 1 }
    v
  }

  /** Per-channel pixel statistics + 8-bin luma histogram of a 24-bit
    * uncompressed BMP, decoded from the REAL pixel rows: BGR byte
    * order, rows stride-padded to 4 bytes (padding excluded), data
    * offset honored from the file header, top-down (negative height)
    * accepted. Luma bins use integer arithmetic so an oracle can
    * recompute them byte-exactly: bin = min(7, (299R+587G+114B)/31875)
    * — 31875 = 255·1000/8. None for non-BMP / compressed / non-24-bit
    * / truncated payloads (corruption degrades to "no stats", never to
    * a job failure). */
  private[graft] def bmpPixelStats(bytes: Array[Byte])
      : Option[(Array[Long], Array[Long])] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOff = leLong(bytes, 10, 4)
    val w = leLong(bytes, 18, 4)
    // toInt first (the field is a signed 32-bit int: negative =
    // top-down), then widen BEFORE abs — abs(Int.MinValue) stays
    // negative in Int arithmetic
    val h = math.abs(leLong(bytes, 22, 4).toInt.toLong)
    val bpp = leLong(bytes, 28, 2)
    val compression = leLong(bytes, 30, 4)
    if (bpp != 24 || compression != 0 || w <= 0 || h == 0) return None
    // overflow fences BEFORE the size check: a crafted header with
    // w≈2^32 or h≈2^31 would wrap rowBytes*h negative and sail past
    // the bounds guard into garbage indexing — each dimension is
    // first bounded by what the payload could possibly hold, after
    // which rowBytes ≤ len+3 and h ≤ len keep the product overflow-free
    if (w > bytes.length.toLong / 3 || h > bytes.length.toLong) return None
    val rowBytes = (w * 3 + 3) / 4 * 4
    if (dataOff < 54 || dataOff + rowBytes * h > bytes.length) return None
    // [bSum,bMin,bMax, gSum,gMin,gMax, rSum,rMin,rMax, nPx]
    val stats = Array(0L, 255L, 0L, 0L, 255L, 0L, 0L, 255L, 0L, 0L)
    val hist = new Array[Long](8)
    var row = 0
    while (row < h) {
      var base = (dataOff + row * rowBytes).toInt
      var x = 0
      while (x < w) {
        val b = u8(bytes, base); val g = u8(bytes, base + 1)
        val r = u8(bytes, base + 2)
        stats(0) += b; if (b < stats(1)) stats(1) = b; if (b > stats(2)) stats(2) = b
        stats(3) += g; if (g < stats(4)) stats(4) = g; if (g > stats(5)) stats(5) = g
        stats(6) += r; if (r < stats(7)) stats(7) = r; if (r > stats(8)) stats(8) = r
        val bin = math.min(7L, (299L * r + 587L * g + 114L * b) / 31875L)
        hist(bin.toInt) += 1
        base += 3; x += 1
      }
      row += 1
    }
    stats(9) = w * h
    Some((stats, hist))
  }

  /** Signed 16-bit PCM sample statistics of a canonical-layout WAV
    * (44-byte header, fmt then data — the [[wavBytes]]/most-encoder
    * shape [[decodeWav]] already assumes): sum/min/max/count over ALL
    * interleaved samples, little-endian two's complement. None for
    * non-WAV / non-PCM / non-16-bit / truncated payloads. */
  private[graft] def wavSampleStats(bytes: Array[Byte])
      : Option[Array[Long]] = {
    if (bytes.length < 44 ||
        bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' ||
        bytes(3) != 'F' || bytes(8) != 'W' || bytes(9) != 'A' ||
        bytes(10) != 'V' || bytes(11) != 'E') return None
    val audioFormat = leLong(bytes, 20, 2)
    val bitDepth = leLong(bytes, 34, 2)
    val dataSize = leLong(bytes, 40, 4)
    // the canonical layout this decoder supports has "data" at 36 —
    // verify it rather than assume: the common 18-byte-fmt variant
    // passes the format/depth checks by coincidence and would yield
    // silently misaligned samples
    if (audioFormat != 1 || bitDepth != 16 ||
        bytes(36) != 'd' || bytes(37) != 'a' ||
        bytes(38) != 't' || bytes(39) != 'a' ||
        44 + dataSize > bytes.length) return None
    val n = dataSize / 2
    var sum = 0L; var min = Long.MaxValue; var max = Long.MinValue
    var j = 0
    while (j < n) {
      val raw = u8(bytes, 44 + 2 * j) | (u8(bytes, 45 + 2 * j) << 8)
      val s: Long = (raw.toShort).toLong // two's complement
      sum += s; if (s < min) min = s; if (s > max) max = s
      j += 1
    }
    if (n == 0) Some(Array(0L, 0L, 0L, 0L)) else Some(Array(sum, min, max, n))
  }

  // ---------------------------------------------------------------
  // PNG: real encode (filtered scanlines + DEFLATE) and real decode
  // (INFLATE + the five per-row filter reversals). No external codec:
  // PNG's only compression is DEFLATE, provided by java.util.zip.
  // ---------------------------------------------------------------

  private def crc32Of(parts: Array[Byte]*): Long = {
    val c = new java.util.zip.CRC32
    parts.foreach(c.update)
    c.getValue
  }

  private def be4(v: Long): Array[Byte] = Array(
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val t = tag.getBytes("US-ASCII")
    be4(data.length.toLong) ++ t ++ data ++ be4(crc32Of(t, data))
  }

  /** Paeth predictor (PNG spec §9.4) — shared by encode and decode. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** COMPLETE 8-bit truecolor PNG encode: IHDR, one IDAT holding the
    * DEFLATE stream of the filtered scanlines, IEND — every chunk CRC
    * computed for real. The raw pixel stream (RGB row-major, no
    * padding) tiles `content`; each row's filter type cycles
    * `row % 5` through None/Sub/Up/Average/Paeth, so a decoder must
    * implement ALL FIVE reversals to get the pixels back. JVM-side
    * (DEFLATE is not column algebra) — used from per-partition
    * generators; [[pngBytes]] stays the header-only column-algebra
    * variant. */
  private[graft] def pngEncode(width: Int, height: Int,
                               content: Array[Byte],
                               channels: Int = 3): Array[Byte] = {
    require(width > 0 && height > 0 && content.nonEmpty)
    require(channels == 3 || channels == 4, "RGB or RGBA only")
    val rowLen = width * channels
    val raw = Array.tabulate(rowLen * height)(i => content(i % content.length))
    val filtered = new Array[Byte]((rowLen + 1) * height)
    var y = 0
    while (y < height) {
      val f = y % 5
      filtered(y * (rowLen + 1)) = f.toByte
      var i = 0
      while (i < rowLen) {
        val cur = raw(y * rowLen + i) & 0xFF
        val left = if (i >= channels) raw(y * rowLen + i - channels) & 0xFF else 0
        val up = if (y > 0) raw((y - 1) * rowLen + i) & 0xFF else 0
        val ul = if (y > 0 && i >= channels) raw((y - 1) * rowLen + i - channels) & 0xFF else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        filtered(y * (rowLen + 1) + 1 + i) = ((cur - pred) & 0xFF).toByte
        i += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered); deflater.finish()
    val out = new java.io.ByteArrayOutputStream(filtered.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val colorType: Byte = if (channels == 4) 6 else 2 // truecolor(+alpha)
    val ihdr = be4(width.toLong) ++ be4(height.toLong) ++
      Array[Byte](8, colorType, 0, 0, 0) // depth 8, std compr/filter/interlace
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** REAL PNG pixel decode down to per-channel statistics: chunk walk
    * with every CRC verified, IDAT streams concatenated and INFLATED
    * (`java.util.zip.Inflater`), the five row filters
    * (None/Sub/Up/Average/Paeth) undone per the spec, then the same
    * stats as [[bmpPixelStats]] — per-channel sum/min/max (returned in
    * the shared [b,g,r] slot order), pixel count, and the 8-bin integer
    * luma histogram (bin = min(7, (299R+587G+114B)/31875)). 8-bit
    * truecolor (RGB) and truecolor+alpha (RGBA, alpha excluded from
    * stats) supported; palette/interlaced/16-bit and any corruption
    * (bad CRC, short inflate, bad filter type) degrade to None, never
    * to a job failure. Only JPEG pixels (DCT) and video demuxing
    * remain stubbed — those genuinely need codecs this build lacks. */
  private[graft] def pngPixelStats(bytes: Array[Byte])
      : Option[(Array[Long], Array[Long])] = {
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    if (bytes.length < 45 || !bytes.take(8).sameElements(sig)) return None
    var pos = 8
    var w = 0; var h = 0; var depth = -1; var colorType = -1
    var interlace = -1; var sawIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    var sawIend = false
    while (!sawIend && pos + 12 <= bytes.length) {
      val len = ((bytes(pos) & 0xFFL) << 24) | ((bytes(pos + 1) & 0xFFL) << 16) |
        ((bytes(pos + 2) & 0xFFL) << 8) | (bytes(pos + 3) & 0xFFL)
      if (len > Int.MaxValue - 12 || pos + 12 + len > bytes.length) return None
      val tag = new String(bytes, pos + 4, 4, "US-ASCII")
      val dataOff = pos + 8
      val stored = ((bytes(dataOff + len.toInt) & 0xFFL) << 24) |
        ((bytes(dataOff + len.toInt + 1) & 0xFFL) << 16) |
        ((bytes(dataOff + len.toInt + 2) & 0xFFL) << 8) |
        (bytes(dataOff + len.toInt + 3) & 0xFFL)
      val c = new java.util.zip.CRC32
      c.update(bytes, pos + 4, 4 + len.toInt)
      if (c.getValue != stored) return None // corruption detected, not trusted
      tag match {
        case "IHDR" =>
          if (len != 13) return None
          w = (((bytes(dataOff) & 0xFFL) << 24) | ((bytes(dataOff + 1) & 0xFFL) << 16) |
            ((bytes(dataOff + 2) & 0xFFL) << 8) | (bytes(dataOff + 3) & 0xFFL)).toInt
          h = (((bytes(dataOff + 4) & 0xFFL) << 24) | ((bytes(dataOff + 5) & 0xFFL) << 16) |
            ((bytes(dataOff + 6) & 0xFFL) << 8) | (bytes(dataOff + 7) & 0xFFL)).toInt
          depth = bytes(dataOff + 8) & 0xFF
          colorType = bytes(dataOff + 9) & 0xFF
          interlace = bytes(dataOff + 12) & 0xFF
          sawIhdr = true
        case "IDAT" => idat.write(bytes, dataOff, len.toInt)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunks are CRC-checked above, then skipped
      }
      pos = dataOff + len.toInt + 4
    }
    if (!sawIhdr || !sawIend || idat.size() == 0) return None
    if (depth != 8 || (colorType != 2 && colorType != 6) || interlace != 0)
      return None // palette/interlaced/16-bit: refused loudly, not guessed
    val bpp = if (colorType == 2) 3 else 4
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 28)) return None
    val rowLen = w * bpp
    val expect = (rowLen + 1).toLong * h
    if (expect > Int.MaxValue) return None
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val scan = new Array[Byte](expect.toInt)
    try {
      var off = 0
      while (off < scan.length && !inflater.finished()) {
        val n = inflater.inflate(scan, off, scan.length - off)
        if (n == 0 && inflater.needsInput()) return None // truncated stream
        off += n
      }
      if (off != scan.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inflater.end()
    // undo filters in place: raw(y) = recon over filtered row y
    val raw = new Array[Byte](rowLen * h)
    var y = 0
    while (y < h) {
      val f = scan(y * (rowLen + 1)) & 0xFF
      if (f > 4) return None
      var i = 0
      while (i < rowLen) {
        val x = scan(y * (rowLen + 1) + 1 + i) & 0xFF
        val left = if (i >= bpp) raw(y * rowLen + i - bpp) & 0xFF else 0
        val up = if (y > 0) raw((y - 1) * rowLen + i) & 0xFF else 0
        val ul = if (y > 0 && i >= bpp) raw((y - 1) * rowLen + i - bpp) & 0xFF else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(y * rowLen + i) = ((x + pred) & 0xFF).toByte
        i += 1
      }
      y += 1
    }
    // same stat layout as bmpPixelStats: [bSum,bMin,bMax, gSum,gMin,
    // gMax, rSum,rMin,rMax, nPx] — PNG is RGB(A) byte order, so the
    // channel offsets invert relative to BMP's BGR
    val stats = Array(0L, 255L, 0L, 0L, 255L, 0L, 0L, 255L, 0L, 0L)
    val hist = new Array[Long](8)
    var p = 0
    while (p < raw.length) {
      val r = raw(p) & 0xFF; val g = raw(p + 1) & 0xFF
      val b = raw(p + 2) & 0xFF
      stats(0) += b; if (b < stats(1)) stats(1) = b; if (b > stats(2)) stats(2) = b
      stats(3) += g; if (g < stats(4)) stats(4) = g; if (g > stats(5)) stats(5) = g
      stats(6) += r; if (r < stats(7)) stats(7) = r; if (r > stats(8)) stats(8) = r
      hist(math.min(7L, (299L * r + 587L * g + 114L * b) / 31875L).toInt) += 1
      p += bpp
    }
    stats(9) = w.toLong * h
    Some((stats, hist))
  }

  private val imageStatsType = StructType(Seq(
    StructField("b_sum", LongType), StructField("b_min", LongType),
    StructField("b_max", LongType), StructField("g_sum", LongType),
    StructField("g_min", LongType), StructField("g_max", LongType),
    StructField("r_sum", LongType), StructField("r_min", LongType),
    StructField("r_max", LongType), StructField("n_px", LongType),
    StructField("luma_hist", ArrayType(LongType, containsNull = false))))

  private val audioStatsType = StructType(Seq(
    StructField("s_sum", LongType), StructField("s_min", LongType),
    StructField("s_max", LongType), StructField("n_samples", LongType)))

  /** Append a nullable `image_stats` struct to `df`, decoded FOR REAL
    * from the payload column: BMP pixel rows or PNG
    * (inflate + filter reversal) — see [[bmpPixelStats]]/
    * [[pngPixelStats]]. Per-partition batched like [[extractFeatures]];
    * undecodable payloads yield a null struct, never a failure. */
  def withImageStats(df: DataFrame, bytesCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("image_stats", imageStatsType, nullable = true))
    val enc = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val stats = Option(r.get(idx))
          .map(_.asInstanceOf[Array[Byte]])
          .flatMap(b => bmpPixelStats(b).orElse(pngPixelStats(b)))
        val st = stats.map { case (s, hist) =>
          Row(s(0), s(1), s(2), s(3), s(4), s(5), s(6), s(7), s(8), s(9),
            hist.toSeq)
        }.orNull
        Row.fromSeq(r.toSeq :+ st)
      }
    }(enc)
  }

  /** Feature extraction over media batches via `mapPartitions` — the
    * genuine per-partition imperative path a real decoder would use
    * (decode state opened once per batch, not per row).
    *
    * BMP and WAV payloads are decoded FOR REAL down to pixels/samples
    * (no codec needed — [[bmpPixelStats]]/[[wavSampleStats]]):
    * `image_stats` carries per-channel sum/min/max + an 8-bin integer
    * luma histogram, `audio_stats` carries sample sum/min/max/count,
    * and `features` is derived from those real statistics (normalized
    * channel/sample means and extrema). PNG payloads are decoded FOR
    * REAL too ([[pngPixelStats]]: inflate + the five filter
    * reversals). Only JPEG stays header-only ([[decodeJpeg]]) and
    * video demuxing has no codec in this build, so payloads that are
    * none of BMP/PNG/WAV fall back to a ---- STUB ---- deterministic
    * 8-dim byte projection (stats null), standing in for a real
    * codec. */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false),
        nullable = false),
      StructField("image_stats", imageStatsType, nullable = true),
      StructField("audio_stats", audioStatsType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "kind", "bytes").mapPartitions { rows =>
      // per-partition setup (a real impl would open the codec here, once)
      rows.map { r =>
        val id = r.getLong(0)
        val kind = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        val img = bmpPixelStats(bytes).orElse(pngPixelStats(bytes))
        val aud = if (img.isDefined) None else wavSampleStats(bytes)
        (img, aud) match {
          case (Some((s, hist)), _) =>
            val n = s(9).toFloat
            val feats = Array(
              s(0) / n / 255f, s(3) / n / 255f, s(6) / n / 255f,
              s(1) / 255f, s(4) / 255f, s(7) / 255f,
              s(2) / 255f, s(5) / 255f, s(8) / 255f)
            Row(id, kind, feats.toSeq,
              Row(s(0), s(1), s(2), s(3), s(4), s(5), s(6), s(7), s(8),
                s(9), hist.toSeq), null)
          case (_, Some(a)) =>
            val n = math.max(1L, a(3)).toFloat
            val feats = Array(a(0) / n / 32768f, a(1) / 32768f, a(2) / 32768f)
            Row(id, kind, feats.toSeq, null, Row(a(0), a(1), a(2), a(3)))
          case _ =>
            // ---- STUB ---- deterministic fake features from byte
            // content — the no-codec-available path (PNG/JPEG pixels,
            // video frames)
            val feats = Array.tabulate(8) { i =>
              var acc = 1125899906842597L
              var j = i
              while (j < bytes.length) { acc = 31 * acc + bytes(j); j += 8 }
              ((acc & 0xFFFFL).toFloat / 65536.0f) - 0.5f
            }
            Row(id, kind, feats.toSeq, null, null)
        }
      }
    }(enc)
  }
}
