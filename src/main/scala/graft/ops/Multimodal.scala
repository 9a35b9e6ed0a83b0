package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride through the
  * pipeline as opaque `binary` columns next to a typed metadata struct
  * (media_type, byte length, checksum, decoded features).
  *
  * The actual codec step is STUBBED (this environment has no image/audio
  * libraries): `decodeStub` derives deterministic fake features from the
  * payload bytes. Everything around it — schema, encoders, partition-wise
  * batch processing via mapPartitions (the Scala analogue of a pandas UDF /
  * mapInPandas batch), and the frame-sampling shape — is real and tested; a
  * production deployment swaps ONLY the marked function body for a codec.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, media_type: String, payload: Array[Byte])
  final case class MediaFeatures(
      media_id: Long, media_type: String, byte_len: Int, checksum: Long,
      width: Int, height: Int, n_frames: Int, brightness: Double)

  /** Attach a binary payload column synthesized deterministically from a text
    * column — stands in for real blobs in tests and benchmarks. */
  def synthesizePayloads(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(xxhash64(col(idCol)), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Partition-wise batch decode — one iterator pass per partition, constant
    * memory, no per-row JVM↔driver traffic. The body of `fakeDecode` is the
    * ONLY stub: it computes deterministic pseudo-features from the bytes
    * where a real implementation would invoke the codec. */
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
    * part of the plumbing that IS fully real today. */
  def metadata(df: DataFrame): DataFrame =
    df.select(col("media_id"), col("media_type"),
      length(col("payload")).as("byte_len"),
      xxhash64(col("payload")).as("xxh64"))
}
