package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride through the
  * pipeline as opaque `binary` columns next to a typed metadata struct
  * (media_type, byte length, checksum, decoded features).
  *
  * What is REAL here: the container-level decode. [[synthesizePayloads]]
  * wraps each document's bytes in a genuine container header — a valid PNG
  * signature + IHDR chunk (real CRC32), a canonical 44-byte WAV RIFF
  * header, or an AVI RIFF with the standard 56-byte `avih` MainAVIHeader —
  * and [[decodeHeaders]] parses those containers back byte-by-byte
  * (magic-sniffed type, dimensions, sample rate/channels, frame counts),
  * exactly as a production metadata pass over real blobs would, via
  * partition-wise `mapPartitions` batches (the Scala analogue of a pandas
  * UDF / mapInPandas). The header parameters derive from `md5(text)` hex
  * arithmetic so an independent DuckDB oracle can recompute the expected
  * decode output (`q_multimodal_decode`).
  *
  * What remains STUBBED (this environment ships no image/audio codecs):
  * pixel/sample DECOMPRESSION — [[decodeStub]] derives deterministic
  * pseudo-features where a real deployment would run the codec; it is the
  * single marked swap point.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, media_type: String, payload: Array[Byte])
  final case class MediaFeatures(
      media_id: Long, media_type: String, byte_len: Int, checksum: Long,
      width: Int, height: Int, n_frames: Int, brightness: Double)

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Deterministic container parameters from md5(text) hex-char codes —
    * the SAME ord() arithmetic the DuckDB oracle uses, so the synthesized
    * headers are independently recomputable:
    * (mediaType, width, height, sampleRate, channels, totalFrames). */
  private[ops] def paramsFor(text: String): (String, Int, Int, Int, Int, Int) = {
    val m = md5Hex(text)
    def o(i: Int): Int = m.charAt(i).toInt
    val width = 16 + (o(0) * 256 + o(1)) % 1024
    val height = 16 + (o(2) * 256 + o(3)) % 1024
    val rate = 8000 + (o(4) % 8) * 4000
    val channels = 1 + o(5) % 2
    val frames = 1 + (o(6) * 256 + o(7)) % 300
    val t = Seq("image", "audio", "video")(o(8) % 3)
    (t, width, height, rate, channels, frames)
  }

  // ---- container builders (real formats, header-level) --------------------

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** 33-byte valid PNG prefix: signature + IHDR (8-bit RGB) with a REAL
    * CRC32 over the chunk type+data, followed by the body. */
  private[ops] def pngContainer(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdrData = be32(width) ++ be32(height) ++ Array[Byte](8, 2, 0, 0, 0)
    val crc = new java.util.zip.CRC32
    crc.update("IHDR".getBytes("US-ASCII")); crc.update(ihdrData)
    sig ++ be32(13) ++ "IHDR".getBytes("US-ASCII") ++ ihdrData ++ be32(crc.getValue.toInt) ++ body
  }

  /** Canonical 44-byte WAV header (PCM16) + body as the data chunk. */
  private[ops] def wavContainer(sampleRate: Int, channels: Int, body: Array[Byte]): Array[Byte] = {
    val blockAlign = channels * 2
    "RIFF".getBytes("US-ASCII") ++ le32(36 + body.length) ++ "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(sampleRate) ++ le32(sampleRate * blockAlign) ++ le16(blockAlign) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  /** 88-byte AVI RIFF prefix with the standard 56-byte `avih`
    * MainAVIHeader (dwTotalFrames at +16, dwWidth/dwHeight at +32/+36). */
  private[ops] def aviContainer(width: Int, height: Int, totalFrames: Int,
                                body: Array[Byte]): Array[Byte] = {
    val avih = le32(33333) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(totalFrames) ++
      le32(0) ++ le32(1) ++ le32(0) ++ le32(width) ++ le32(height) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    "RIFF".getBytes("US-ASCII") ++ le32(80 + body.length) ++ "AVI ".getBytes("US-ASCII") ++
      "LIST".getBytes("US-ASCII") ++ le32(4 + 8 + 56) ++ "hdrl".getBytes("US-ASCII") ++
      "avih".getBytes("US-ASCII") ++ le32(56) ++ avih ++ body
  }

  /** Attach a binary payload column synthesized deterministically from a
    * text column: the text bytes wrapped in a REAL container header whose
    * parameters come from [[paramsFor]] — stands in for real blobs in tests
    * and benchmarks while exercising genuine byte-level decoding. */
  def synthesizePayloads(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val (t, w, h, rate, ch, fr) = paramsFor(text)
        val body = text.getBytes("UTF-8")
        val payload = t match {
          case "image" => pngContainer(w, h, body)
          case "audio" => wavContainer(rate, ch, body)
          case _ => aviContainer(w, h, fr, body)
        }
        MediaRow(id, t, payload)
      }.toDF()
  }

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def u32be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def ascii(b: Array[Byte], i: Int, n: Int): String =
    new String(b, i, n, "US-ASCII")

  /** REAL container-header decode, partition-wise: sniffs the format from
    * its magic bytes and parses dimensions / sample rate / frame counts
    * straight out of the header — no codec involved, works on any
    * spec-conforming PNG/WAV/AVI blob, not just synthesized ones. Field
    * mapping: image (width, height, 1 frame); audio (width = sampleRate,
    * height = channels, n_frames = data samples = dataSize/blockAlign);
    * video (width, height, dwTotalFrames). `brightness` is the mean body
    * byte — REAL brightness needs pixel decode, which stays in
    * [[decodeStub]]. Unknown payloads fall back to the stub features with
    * media_type "unknown". */
  def decodeHeaders(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val b = r.payload
        def checksum: Long = {
          var h = 1125899906842597L; var i = 0
          while (i < b.length) { h = 31 * h + b(i); i += 1 }
          h
        }
        def bodyMean(offset: Int): Double = {
          if (b.length <= offset) return 0.0
          var s = 0L; var i = offset
          while (i < b.length) { s += (b(i) & 0xff); i += 1 }
          s.toDouble / ((b.length - offset) * 255.0)
        }
        val png = b.length >= 33 &&
          (b(0) & 0xff) == 0x89 && ascii(b, 1, 3) == "PNG" && ascii(b, 12, 4) == "IHDR"
        val wav = b.length >= 44 && ascii(b, 0, 4) == "RIFF" && ascii(b, 8, 4) == "WAVE"
        val avi = b.length >= 88 && ascii(b, 0, 4) == "RIFF" && ascii(b, 8, 4) == "AVI "
        if (png) {
          MediaFeatures(r.media_id, "image", b.length, checksum,
            u32be(b, 16), u32be(b, 20), 1, bodyMean(33))
        } else if (wav) {
          // walk RIFF chunks for fmt and data (canonical layout puts fmt at
          // 12, but parse positionally for spec conformance)
          var off = 12
          var rate = 0; var ch = 1; var dataSize = 0; var blockAlign = 2
          var malformed = false
          while (!malformed && off + 8 <= b.length) {
            val id = ascii(b, off, 4); val sz = u32le(b, off + 4)
            if (id == "fmt " && off + 24 <= b.length) {
              ch = u16le(b, off + 10); rate = u32le(b, off + 12); blockAlign = u16le(b, off + 20)
            } else if (id == "data" && sz >= 0 && off + 8 + sz <= b.length) {
              // only accept a data size the buffer can actually hold — a
              // truncated blob declaring sz > remaining must not poison the
              // bodyMean offset below
              dataSize = sz
            }
            // a corrupt size must not walk backwards, spin, or overflow the
            // offset — stop parsing (fields found so far are kept). Advance
            // includes the RIFF word-alignment pad byte for odd-sized chunks.
            if (sz < 0 || sz > b.length) malformed = true else off += 8 + sz + (sz & 1)
          }
          val frames = if (blockAlign > 0) dataSize / blockAlign else 0
          MediaFeatures(r.media_id, "audio", b.length, checksum, rate, ch, frames,
            bodyMean(math.max(0, b.length - dataSize)))
        } else if (avi) {
          // find the avih chunk inside the hdrl LIST
          var off = 12; var w = 0; var h = 0; var fr = 0
          var found = false
          // reading the MainAVIHeader touches bytes up to off+8+40, so the
          // scan must guarantee that much buffer — an 'avih' byte string in
          // the trailing body of a truncated blob must not crash the task
          while (!found && off + 48 <= b.length) {
            if (ascii(b, off, 4) == "avih") {
              val d = off + 8
              fr = u32le(b, d + 16); w = u32le(b, d + 32); h = u32le(b, d + 36)
              found = true
            } else off += 4
          }
          MediaFeatures(r.media_id, "video", b.length, checksum, w, h, fr, bodyMean(88))
        } else {
          // --- STUB fallback: unknown container → pseudo-features (the
          // codec-shaped remainder a real deployment replaces) ---
          var h = 1125899906842597L; var i = 0; var sum = 0L
          while (i < b.length) { h = 31 * h + b(i); sum += (b(i) & 0xff); i += 1 }
          MediaFeatures(r.media_id, "unknown", b.length, h,
            16 + (math.abs(h) % 1024).toInt, 16 + (math.abs(h >> 10) % 1024).toInt, 1,
            if (b.isEmpty) 0.0 else sum.toDouble / (b.length * 255.0))
        }
      }
    }
  }

  /** Partition-wise batch decode — one iterator pass per partition, constant
    * memory, no per-row JVM↔driver traffic. The body of the loop is the
    * ONLY remaining stub: it computes deterministic pseudo-features from the
    * bytes where a real implementation would invoke the pixel/sample codec
    * (container METADATA is already real — see [[decodeHeaders]]). */
  def decodeStub(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        // --- STUB: replace with real codec (e.g. javax.imageio / ffmpeg) ---
        val bytes = r.payload
        var h = 1125899906842597L
        var i = 0
        var sum = 0L
        while (i < bytes.length) { h = 31 * h + bytes(i); sum += (bytes(i) & 0xff); i += 1 }
        val width = 16 + (math.abs(h) % 1024).toInt
        val height = 16 + (math.abs(h >> 10) % 1024).toInt
        val frames = if (r.media_type == "video") 1 + (math.abs(h >> 20) % 300).toInt else 1
        val brightness = if (bytes.isEmpty) 0.0 else sum.toDouble / (bytes.length * 255.0)
        // --- end stub ---
        MediaFeatures(r.media_id, r.media_type, bytes.length, h, width, height, frames, brightness)
      }
    }
  }

  /** Frame sampling shape: explode a video row into every-nth-frame rows —
    * the partition/row explosion a real frame extractor would produce. */
  def sampleFrames(features: Dataset[MediaFeatures], everyNth: Int): DataFrame = {
    features.toDF()
      .filter(col("media_type") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyNth))).as("frame_idx"))
  }

  /** Pure-SQL metadata extraction (no decode): length + checksum + type — the
    * container-blind part of the plumbing. */
  def metadata(df: DataFrame): DataFrame =
    df.select(col("media_id"), col("media_type"),
      length(col("payload")).as("byte_len"),
      xxhash64(col("payload")).as("xxh64"))
}
