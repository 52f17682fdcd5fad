package graft

import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.MediaOps
import graft.multimodal.MediaOps.{MediaRow, ResizedRow}

/** Real-codec path of the multimodal operators: JDK ImageIO decode,
  * pixel feature extraction, and pixel resize, driven end-to-end through
  * the typed Dataset operators on generated PNGs — plus the fallback
  * contract for payloads no codec accepts. */
class MediaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Deterministic gradient PNG. */
  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 255 / math.max(w - 1, 1)) & 0xFF
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("meta/frames slice payload BYTES, not characters, on non-ASCII media") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 'żółw abc' UTF-8: first byte 0xC5 (197), first 8 bytes split the
    // text's 4th multi-byte char — byte semantics must hold anyway
    val bytes = "żółw abc".getBytes("UTF-8")
    val df = Seq(("żółw abc", 1L)).toDF("text", "doc_id")
      .select(col("doc_id"), col("text").cast("binary").as("media"))
    val got = df.select(
      conv(hex(substring(col("media"), 1, 1)), 16, 10)
        .cast("int").as("first_byte"),
      base64(substring(col("media"), 1, 8)).as("b64")).head
    assert(got.getInt(0) == (bytes(0) & 0xFF))
    assert(got.getString(1) ==
      java.util.Base64.getEncoder.encodeToString(bytes.take(8)))
  }

  test("extractFeatures decodes real PNGs to luminance histograms") {
    import spark.implicits._
    val bytes = png(32, 16)
    val ds = Seq(MediaRow(1L, bytes, "image"),
      MediaRow(2L, "not an image at all".getBytes("UTF-8"), "audio")).toDS()
    val out = MediaOps.extractFeatures(ds).collect().map(r => r.doc_id -> r.features).toMap
    // doc 1: real decode — must equal imageFeatures on the decoded pixels
    val expected1 = MediaOps.imageFeatures(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    assert(out(1L).toSeq == expected1.toSeq)
    assert(math.abs(out(1L).sum - 1f) < 1e-5) // L1-normalized
    // a gray gradient spreads luminance across many bins — the byte-domain
    // stub on PNG bytes would NOT produce this histogram
    assert(out(1L).count(_ > 0f) > 8)
    assert(out(1L).toSeq != MediaOps.stubDecodeFeatures(bytes).toSeq)
    // doc 2: no codec accepts it — byte-domain stub fallback
    assert(out(2L).toSeq ==
      MediaOps.stubDecodeFeatures("not an image at all".getBytes("UTF-8")).toSeq)
  }

  test("resize downscales real image pixels and re-encodes") {
    import spark.implicits._
    val ds = Seq(MediaRow(1L, png(32, 16), "image")).toDS()
    val out: ResizedRow = MediaOps.resize(ds, factor = 4).collect()(0)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.media))
    assert(img != null, "resized payload must be a decodable PNG")
    assert(img.getWidth == 8 && img.getHeight == 4)
  }

  test("decodeImage returns None for non-image payloads (fixture contract)") {
    assert(MediaOps.decodeImage("plain words".getBytes("UTF-8")).isEmpty)
    assert(MediaOps.decodeImage(Array.empty[Byte]).isEmpty)
    assert(MediaOps.decodeImage(png(4, 4)).isDefined)
  }

  test("magic-byte sniff gates the codec: image containers yes, text no") {
    assert(MediaOps.looksLikeImage(png(4, 4)))
    assert(MediaOps.looksLikeImage(Array[Byte](0xFF.toByte, 0xD8.toByte, 0, 0)))
    assert(MediaOps.looksLikeImage("GIF89a......".getBytes("US-ASCII")))
    assert(MediaOps.looksLikeImage(Array[Byte]('B', 'M', 0, 0)))
    assert(!MediaOps.looksLikeImage("plain words here".getBytes("UTF-8")))
    assert(!MediaOps.looksLikeImage(Array[Byte](1, 2))) // too short
    // truncated PNG magic: sniff passes, codec rejects → stub fallback, no throw
    val truncated = png(4, 4).take(8)
    assert(MediaOps.looksLikeImage(truncated))
    assert(MediaOps.decodeImage(truncated).isEmpty)
    assert(MediaOps.decodeFeatures(truncated).toSeq ==
      MediaOps.stubDecodeFeatures(truncated).toSeq)
  }

  test("pcmFeatures: int16 LE decode, frame energy, zero crossings, odd tail") {
    import spark.implicits._
    // samples: +1, -1, +2, 0, -3 → little-endian byte pairs, plus one
    // trailing odd byte that must be truncated
    def le(s: Short): Seq[Byte] =
      Seq((s & 0xFF).toByte, ((s >> 8) & 0xFF).toByte)
    val samples = Seq[Short](1, -1, 2, 0, -3)
    val bytes = (samples.flatMap(le) :+ 0x7F.toByte).toArray
    val ds = Seq(MediaOps.MediaRow(7L, bytes, "audio")).toDS()
    val r = MediaOps.pcmFeatures(ds, frameSamples = 2).collect().head
    assert(r.doc_id == 7L)
    assert(r.n_samples == 5)
    assert(r.n_frames == 3) // ceil(5/2)
    assert(r.total_energy == 1L + 1 + 4 + 0 + 9)
    // frames: (1,-1)=2, (2,0)=4, (-3)=9
    assert(r.max_frame_energy == 9L)
    // sign sequence skipping zero: + - + - → 3 crossings
    assert(r.zero_crossings == 3)

    // empty payload: all zeros, no frames
    val empty = MediaOps.pcmFeatures(
      Seq(MediaOps.MediaRow(8L, Array.empty[Byte], "audio")).toDS())
      .collect().head
    assert(empty.n_samples == 0 && empty.n_frames == 0 &&
      empty.total_energy == 0L && empty.zero_crossings == 0)
  }
}
