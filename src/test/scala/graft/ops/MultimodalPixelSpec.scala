package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import scala.util.Random

/** The real pixel/sample decode path (Multimodal.decodePng / decodeWavPcm /
  * decodePixels), cross-validated against an INDEPENDENT decoder: the JDK's
  * own javax.imageio PNG codec. Random-pixel images exercise whatever filter
  * choices ImageIO's encoder makes; graft's own encoder (pngFull) rotates
  * through all five PNG filter types and must round-trip through BOTH
  * decoders. */
class MultimodalPixelSpec extends SparkTestBase {
  import spark.implicits._

  private def brightnessOf(img: BufferedImage): Double = {
    var sum = 0L
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val p = img.getRGB(x, y)
      sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
    }
    sum.toDouble / (img.getWidth.toLong * img.getHeight * 3 * 255.0)
  }

  test("decodePng matches javax.imageio pixel-exactly on random-pixel PNGs") {
    for (seed <- Seq(9L, 41L, 137L)) {
      val rnd = new Random(seed)
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(40)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rnd.nextInt() & 0xFFFFFF)
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      val got = Multimodal.decodePng(bos.toByteArray)
      assert(got.isDefined, s"seed=$seed: decodePng rejected an ImageIO-encoded PNG")
      val (gw, gh, gb) = got.get
      assert(gw == w && gh == h, s"seed=$seed: $gw x $gh != $w x $h")
      assert(gb == brightnessOf(img), s"seed=$seed: brightness $gb != ${brightnessOf(img)}")
    }
  }

  test("pngFull round-trips through BOTH decoders (all five filter types in-stream)") {
    // heights >= 5 guarantee the y % 5 rotation emits every filter type
    for ((w, h, r, g, b) <- Seq((17, 9, 200, 5, 77), (8, 8, 0, 0, 0), (63, 6, 255, 255, 255))) {
      val bytes = Multimodal.pngFull(w, h, r, g, b)
      val own = Multimodal.decodePng(bytes)
      assert(own.contains((w, h, (w.toLong * h * (r + g + b)).toDouble / (w.toLong * h * 3 * 255.0))))
      val iio = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(iio != null, "javax.imageio rejected a pngFull image")
      assert(iio.getWidth == w && iio.getHeight == h)
      assert((iio.getRGB(w - 1, h - 1) & 0xFFFFFF) == ((r << 16) | (g << 8) | b))
    }
  }

  test("decodeWavPcm recovers rate/channels/frames and exact mean amplitude") {
    val bytes = Multimodal.wavPcm(16000, 2, 100, -1234)
    assert(Multimodal.decodeWavPcm(bytes).contains((16000, 2, 100, 1234.0 / 32768.0)))
    // positive sample, mono
    assert(Multimodal.decodeWavPcm(Multimodal.wavPcm(8000, 1, 64, 32767))
      .contains((8000, 1, 64, 32767.0 / 32768.0)))
  }

  test("corrupt payloads fall back instead of crashing") {
    val png = Multimodal.pngFull(10, 10, 1, 2, 3)
    val flipped = png.clone(); flipped(40) = (flipped(40) ^ 0x55).toByte // damage IDAT → CRC fails
    assert(Multimodal.decodePng(flipped).isEmpty)
    assert(Multimodal.decodePng(png.take(30)).isEmpty) // truncated
    val wav = Multimodal.wavPcm(8000, 1, 10, 5)
    val badFmt = wav.clone(); badFmt(20) = 9 // compression code != PCM
    assert(Multimodal.decodeWavPcm(badFmt).isEmpty)
    // IHDR declaring huge-but-positive dims: Int h*(1+w*bpp) wraps negative
    // (NegativeArraySizeException pre-guard) — must return None, and must
    // decide BEFORE allocating, so a 100-byte blob can't demand gigabytes.
    // CRC is recomputed so the chunk passes integrity and reaches the sizer.
    val bigDims = png.clone()
    def putBe32(a: Array[Byte], at: Int, v: Int): Unit = {
      a(at) = (v >> 24).toByte; a(at + 1) = (v >> 16).toByte
      a(at + 2) = (v >> 8).toByte; a(at + 3) = v.toByte
    }
    putBe32(bigDims, 16, 0x20000000) // width  536870912
    putBe32(bigDims, 20, 4)          // height 4 → rawLen > Int.MaxValue
    val ihdrCrc = new java.util.zip.CRC32
    ihdrCrc.update(bigDims, 12, 17)  // type + 13 data bytes
    putBe32(bigDims, 29, ihdrCrc.getValue.toInt)
    assert(Multimodal.decodePng(bigDims).isEmpty)
    // and through the Spark surface: unknowns come back typed, no task failure
    val media = Seq(
      Multimodal.MediaRow(1L, "image", flipped),
      Multimodal.MediaRow(2L, "audio", wav),
      Multimodal.MediaRow(3L, "junk", Array[Byte](1, 2, 3))).toDS()
    val out = Multimodal.decodePixels(spark, media).collect().map(f => f.media_id -> f.media_type).toMap
    assert(out == Map(1L -> "unknown", 2L -> "audio", 3L -> "unknown"))
  }

  test("declared chunk lengths near 2^31 must not wrap past the bounds guards") {
    // PNG: signature + a chunk whose declared length would make an
    // addition-form bound (off + 12 + len) wrap negative and pass — the
    // old guard then crashed in crc.update with AIOOBE instead of None
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val hugePng = sig ++ Array[Byte](0x7f, -1, -1, -16) ++
      "IHDR".getBytes("US-ASCII") ++ new Array[Byte](32)
    assert(Multimodal.decodePng(hugePng).isEmpty)
    // WAV: a data chunk declaring sz near 2^31 — the old guard set
    // dataOff/dataSize before the malformed check fired, then sample
    // parsing read far out of bounds
    val wav = Multimodal.wavPcm(8000, 1, 10, 5)
    val hugeWav = wav.clone()
    hugeWav(40) = -16; hugeWav(41) = -1; hugeWav(42) = -1; hugeWav(43) = 0x7f
    assert(Multimodal.decodeWavPcm(hugeWav).isEmpty)
    // and decodeHeaders' chunk walk (same pattern): must not crash the task
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", hugePng),
      Multimodal.MediaRow(2L, "audio", hugeWav)).toDS()
    val byId = Multimodal.decodeHeaders(spark, rows).collect().map(f => f.media_id -> f).toMap
    assert(byId(2L).media_type == "audio" && byId(2L).n_frames == 0) // no decodable data chunk
    val pix = Multimodal.decodePixels(spark, rows).collect().map(f => f.media_id -> f.media_type).toMap
    assert(pix == Map(1L -> "unknown", 2L -> "unknown"))
  }

  test("decodeAviFrames recovers dims, frame count and exact all-frame brightness") {
    // odd width → DWORD row padding in play; pad bytes must NOT enter the mean
    for ((w, h, nf) <- Seq((9, 8, 3), (8, 8, 2), (31, 17, 7))) {
      val avi = Multimodal.aviFull(w, h, nf, 10, 20, 30)
      val got = Multimodal.decodeAviFrames(avi)
      val sum = (0 until nf).map(f => (10 + 13 * f) % 256 + (20 + 17 * f) % 256 + (30 + 19 * f) % 256)
        .map(_.toLong * w * h).sum
      assert(got.contains((w, h, nf, sum.toDouble / (nf.toLong * w * h * 3 * 255.0))), s"$w x $h x $nf")
    }
  }

  test("corrupt / truncated / compressed AVIs fall back instead of crashing") {
    val avi = Multimodal.aviFull(12, 10, 3, 1, 2, 3)
    assert(Multimodal.decodeAviFrames(avi.take(avi.length / 2)).isEmpty) // truncated mid-movi
    assert(Multimodal.decodeAviFrames(avi.take(40)).isEmpty) // truncated in hdrl
    val comp = avi.clone() // biCompression at strf data +16; strf data starts at 12+8+4+8+56+8+4+8+56+8 = 172... locate by scan
    val strfAt = comp.sliding(4).indexWhere(_.sameElements("strf".getBytes("US-ASCII")))
    comp(strfAt + 8 + 16) = 1 // BI_RLE8 → needs a codec → None
    assert(Multimodal.decodeAviFrames(comp).isEmpty)
    val badFrame = avi.clone() // declared frame size ≠ stride*h
    val dbAt = badFrame.sliding(4).indexWhere(_.sameElements("00db".getBytes("US-ASCII")))
    badFrame(dbAt + 4) = (badFrame(dbAt + 4) ^ 1).toByte
    assert(Multimodal.decodeAviFrames(badFrame).isEmpty)
    // declared chunk size near 2^31 must not wrap the subtraction-form bound
    val huge = avi.clone()
    huge(dbAt + 4) = -16; huge(dbAt + 5) = -1; huge(dbAt + 6) = -1; huge(dbAt + 7) = 0x7f
    assert(Multimodal.decodeAviFrames(huge).isEmpty)
    // Int-wrap stride check: w=1 → stride 4; h=0x40000008 makes Int
    // stride*h wrap mod 2^32 to exactly 32 = the declared frame size, so an
    // Int-arithmetic equality passes and the row loop runs off the array
    val wrap = avi.clone()
    def putLe32(a: Array[Byte], at: Int, v: Int): Unit = {
      a(at) = v.toByte; a(at + 1) = (v >> 8).toByte
      a(at + 2) = (v >> 16).toByte; a(at + 3) = (v >> 24).toByte
    }
    putLe32(wrap, strfAt + 8 + 4, 1)          // biWidth
    putLe32(wrap, strfAt + 8 + 8, 0x40000008) // biHeight
    putLe32(wrap, dbAt + 4, 32)               // frame chunk size
    assert(Multimodal.decodeAviFrames(wrap).isEmpty)
    // through the Spark surface: typed fallback, no task failure
    val rows = Seq(
      Multimodal.MediaRow(1L, "video", avi),
      Multimodal.MediaRow(2L, "video", comp),
      Multimodal.MediaRow(3L, "video", avi.take(40))).toDS()
    val out = Multimodal.decodePixels(spark, rows).collect().map(f => f.media_id -> f.media_type).toMap
    assert(out == Map(1L -> "video", 2L -> "unknown", 3L -> "unknown"))
  }

  test("deterministic fuzz: no mutation of any container can throw from a decoder") {
    // the decoders' contract is total: structurally corrupt input returns
    // None (or a wrong-but-typed Some for mutations that keep the container
    // valid), NEVER an exception — an exception here is a task-killer at
    // 100 TB. Deterministic mutation grid, no Random: every single-byte
    // XOR, every truncation, and extreme 32-bit values at each 4-aligned
    // header offset.
    val containers: Seq[(String, Array[Byte])] = Seq(
      ("png", Multimodal.pngFull(9, 7, 200, 100, 50)),
      ("wav", Multimodal.wavPcm(16000, 2, 50, 1234)),
      ("avi", Multimodal.aviFull(10, 6, 3, 40, 80, 120)))
    def decodeAll(tag: String, b: Array[Byte], what: String): Unit =
      try {
        Multimodal.decodePng(b)
        Multimodal.decodeWavPcm(b)
        Multimodal.decodeAviFrames(b)
        ()
      } catch {
        case e: Throwable => fail(s"$tag $what threw ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    for ((tag, base) <- containers) {
      for (i <- base.indices) {
        val m = base.clone(); m(i) = (m(i) ^ 0xff).toByte
        decodeAll(tag, m, s"xor@$i")
        decodeAll(tag, base.take(i), s"trunc@$i")
      }
      val extremes = Seq(0x7fffffff, 0x80000000, 0xfffffff0, 0x40000008)
      for (off <- 0 until math.min(base.length - 4, 256) by 4; v <- extremes) {
        val m = base.clone()
        m(off) = v.toByte; m(off + 1) = (v >> 8).toByte
        m(off + 2) = (v >> 16).toByte; m(off + 3) = (v >> 24).toByte
        decodeAll(tag, m, s"le32@$off=$v")
      }
    }
  }

  test("synthesizeDecodableVideo → decodePixels: every field matches videoParamsFor") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.synthesizeDecodableVideo(docs, "doc_id", "text")
    val got = Multimodal.decodePixels(spark, media.as[Multimodal.MediaRow])
      .collect().map(f => f.media_id -> f).toMap
    val texts = docs.select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    texts.foreach { case (id, text) =>
      val (w, h, nf, r0, g0, b0) = Multimodal.videoParamsFor(text)
      val f = got(id)
      assert(f.media_type == "video" && f.width == w && f.height == h && f.n_frames == nf)
      val sum = (0 until nf).map(fr => (r0 + 13 * fr) % 256 + (g0 + 17 * fr) % 256 + (b0 + 19 * fr) % 256)
        .map(_.toLong * w * h).sum
      assert(f.brightness == sum.toDouble / (nf.toLong * w * h * 3 * 255.0))
    }
  }

  test("synthesizeDecodable → decodePixels: every field matches pixelParamsFor") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.synthesizeDecodable(docs, "doc_id", "text")
    val got = Multimodal.decodePixels(spark, media.as[Multimodal.MediaRow])
      .collect().map(f => f.media_id -> f).toMap
    val texts = docs.select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    texts.foreach { case (id, text) =>
      val (kind, w, h, r, g, b, rate, ch, nFrames, v) = Multimodal.pixelParamsFor(text)
      val f = got(id)
      if (kind == 0) {
        assert(f.media_type == "image" && f.width == w && f.height == h && f.n_frames == 1)
        assert(f.brightness == (w.toLong * h * (r + g + b)).toDouble / (w.toLong * h * 3 * 255.0))
      } else {
        assert(f.media_type == "audio" && f.width == rate && f.height == ch && f.n_frames == nFrames)
        assert(f.brightness == math.abs(v).toDouble / 32768.0)
      }
    }
  }
}
