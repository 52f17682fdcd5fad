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

  /** Minimal canonical PCM16 WAV: RIFF header + fmt + data chunks, with
    * an optional junk chunk before fmt to exercise the chunk walk. */
  private def wav(samples: Seq[Short], sampleRate: Int = 16000,
      channels: Int = 1, junkChunk: Boolean = false): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit =
      (0 until 4).foreach(i => bo.write((v >> (8 * i)) & 0xFF))
    def w16(v: Int): Unit =
      (0 until 2).foreach(i => bo.write((v >> (8 * i)) & 0xFF))
    val dataBytes = samples.length * 2
    val junkLen = if (junkChunk) 8 + 6 else 0 // "JUNK" + 5 bytes + pad
    bo.write("RIFF".getBytes("US-ASCII"))
    w32(4 + junkLen + 24 + 8 + dataBytes)
    bo.write("WAVE".getBytes("US-ASCII"))
    if (junkChunk) {
      bo.write("JUNK".getBytes("US-ASCII")); w32(5)
      bo.write(Array[Byte](1, 2, 3, 4, 5, 0)) // padded to even
    }
    bo.write("fmt ".getBytes("US-ASCII")); w32(16)
    w16(1); w16(channels); w32(sampleRate)
    w32(sampleRate * channels * 2); w16(channels * 2); w16(16)
    bo.write("data".getBytes("US-ASCII")); w32(dataBytes)
    samples.foreach(s => w16(s & 0xFFFF))
    bo.toByteArray
  }

  test("parseWav walks RIFF chunks; header-only metadata is exact") {
    val b = wav(Seq[Short](100, -200, 300), sampleRate = 8000,
      junkChunk = true)
    val info = MediaOps.parseWav(b).get
    assert(info.audioFormat == 1 && info.channels == 1)
    assert(info.sampleRate == 8000 && info.bitsPerSample == 16)
    assert(info.dataBytes == 6)
    // the data span holds exactly the three samples we wrote
    assert((0 until 3).map(i =>
      ((b(info.dataOffset + 2 * i + 1).toInt << 8) |
        (b(info.dataOffset + 2 * i) & 0xFF)).toShort)
      == Seq[Short](100, -200, 300))
    // non-WAV and malformed payloads are rejected, never thrown on
    assert(MediaOps.parseWav("plain words".getBytes("UTF-8")).isEmpty)
    assert(MediaOps.parseWav(b.take(10)).isEmpty)
    // a declared data size past the payload end is clipped, not rejected
    val over = b.clone()
    val dataSizePos = info.dataOffset - 4
    over(dataSizePos) = 0x40 // claim 64 bytes; only 6 exist
    assert(MediaOps.parseWav(over).get.dataBytes == 6)
  }

  test("pngDims reads IHDR without running the codec") {
    assert(MediaOps.pngDims(png(32, 16)).contains((32, 16)))
    assert(MediaOps.pngDims("plain words padded out to 24+".getBytes("UTF-8")).isEmpty)
    assert(MediaOps.pngDims(png(4, 4).take(20)).isEmpty)
  }

  test("phash: identical pixels collide, near-dups stay close, distinct " +
      "images differ, fallback is deterministic") {
    import graft.multimodal.MediaOps
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // identical pixel content → exact collision (dup detection by groupBy)
    val a1 = MediaOps.phash(png(64, 48))
    val a2 = MediaOps.phash(png(64, 48))
    assert(a1 == a2)
    // the SAME gradient at another resolution is a near-dup: small
    // Hamming distance after the 8×8 normalization
    val b = MediaOps.phash(png(128, 96))
    assert(hamming(a1, b) <= 10)
    // a structurally different image (vertical instead of horizontal
    // gradient) is far away
    val img = new BufferedImage(64, 48, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 64) {
      val v = (y * 255 / 47) & 0xFF
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val c = MediaOps.phash(baos.toByteArray)
    assert(hamming(a1, c) > 10)
    // byte-domain fallback: deterministic and non-degenerate on text
    val t = "the quick brown fox jumps over the lazy dog " * 20
    val f1 = MediaOps.phash(t.getBytes("UTF-8"))
    assert(f1 == MediaOps.phash(t.getBytes("UTF-8")))
    assert(MediaOps.byteAHash(Array.emptyByteArray) == 0L)
    // declared query shape: one row per payload, bucket sizes >= 1
    val out = MediaOps.qMultimodalPhash(TestSpark.spark, TestSpark.sf)
      .collect()
    assert(out.length == 500 || out.length ==
      Tables.documents(TestSpark.spark, TestSpark.sf).count())
    assert(out.forall(_.getLong(2) >= 1L))
  }

  test("phashNearDupPairs: banded join finds exactly the close-hash pairs") {
    import graft.multimodal.MediaOps
    val spark = TestSpark.spark
    import spark.implicits._
    // hand-built hashes: 1<->2 differ in 1 bit, 1<->3 in 3 bits spread
    // across bands (still caught: one band left intact), 4 is far away
    val h1 = 0x0F0F0F0F0F0F0F0FL
    val h2 = h1 ^ (1L << 5)
    val h3 = h1 ^ (1L << 3) ^ (1L << 20) ^ (1L << 40)
    val h4 = ~h1
    val hashes = Seq((1L, h1), (2L, h2), (3L, h3), (4L, h4))
      .toDF("doc_id", "phash")
    val pairs = MediaOps.phashNearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // (2,3) differ in 4 bits (bit 5 + the three of h3) — beyond the
    // threshold, correctly rejected by the exact Hamming verify
    assert(pairs.map(p => (p._1, p._2)) == Set((1L, 2L), (1L, 3L)))
    assert(pairs.forall(_._3 <= 3))
    // and the real-image path: same gradient at two resolutions lands
    // within the banded candidates when their Hamming distance allows
    val ha = MediaOps.phash(png(64, 48))
    val hb = MediaOps.phash(png(128, 96))
    if (java.lang.Long.bitCount(ha ^ hb) <= 3) {
      val real = MediaOps.phashNearDupPairs(
        Seq((10L, ha), (11L, hb)).toDF("doc_id", "phash"), 3).count()
      assert(real == 1)
    }
  }

  test("q_multimodal_phash_pairs: planted twins recalled, pairs exact " +
      "vs a direct recompute") {
    import graft.multimodal.MediaOps
    val spark = TestSpark.spark
    val out = MediaOps.qMultimodalPhashPairs(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // plain-Scala mirror of the planted-twin construction
    val texts = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8"))
    val hashes = texts.flatMap { case (id, b) =>
      val twin = b.clone()
      if (twin.nonEmpty) twin(0) = ((twin(0) + 16) & 0xFF).toByte
      Seq(id -> MediaOps.byteAHash(b),
        (id + 1000000000L) -> MediaOps.byteAHash(twin))
    }
    val byId = hashes.toMap
    // every emitted pair's hamming is the true hash distance and <= 3
    out.foreach { case (a, b, hd) =>
      assert(a < b)
      assert(hd == java.lang.Long.bitCount(byId(a) ^ byId(b)) && hd <= 3)
    }
    // recall on the planted twins: the banding guarantees every
    // (doc, twin) pair within hamming <= 3 is found
    val planted = texts.map(_._1).filter(id =>
      java.lang.Long.bitCount(byId(id) ^ byId(id + 1000000000L)) <= 3)
    val found = out.map(p => (p._1, p._2)).toSet
    planted.foreach(id => assert(found((id, id + 1000000000L)),
      s"planted twin pair for doc $id missed"))
    assert(planted.nonEmpty && out.nonEmpty)
  }

  test("decodeFeatures routes WAV through the real PCM path — stub only " +
      "for opaque bytes") {
    // amplitudes chosen to land in distinct |s|/2048 bins: 0, 1, 15 (clamp)
    val b = wav(Seq[Short](100, -3000, 32767, -32768))
    val got = MediaOps.decodeFeatures(b)
    val expected = new Array[Float](16)
    expected(0) = 0.25f  // |100|/2048 = 0
    expected(1) = 0.25f  // |-3000|/2048 = 1
    expected(15) = 0.5f  // 32767 and |−32768| clamp to bin 15
    assert(got.toSeq == expected.toSeq)
    // the stub on the same bytes is a DIFFERENT histogram — the real
    // path demonstrably ran
    assert(got.toSeq != MediaOps.stubDecodeFeatures(b).toSeq)
    // wavFeatures rejects non-PCM16 (8-bit flagged) containers
    val b8 = b.clone()
    // bitsPerSample field sits 22 bytes into the fmt chunk contents
    val fmtPos = 12 // no junk chunk here: fmt starts right after WAVE
    b8(fmtPos + 8 + 14) = 8
    assert(MediaOps.wavFeatures(b8).isEmpty)
    assert(MediaOps.decodeFeatures(b8).toSeq ==
      MediaOps.stubDecodeFeatures(b8).toSeq)
    // opaque text bytes still hit the stub
    val txt = "plain words".getBytes("UTF-8")
    assert(MediaOps.decodeFeatures(txt).toSeq ==
      MediaOps.stubDecodeFeatures(txt).toSeq)
    // end-to-end through the typed operator: the Dataset path dispatches
    // identically (image → pixels, wav → amplitudes, opaque → stub)
    import spark.implicits._
    val ds = Seq(MediaRow(1L, b, "audio"), MediaRow(2L, txt, "video"),
      MediaRow(3L, png(8, 8), "image")).toDS()
    val out = MediaOps.extractFeatures(ds).collect()
      .map(r => r.doc_id -> r.features.toSeq).toMap
    assert(out(1L) == expected.toSeq)
    assert(out(2L) == MediaOps.stubDecodeFeatures(txt).toSeq)
    assert(out(3L) == MediaOps.decodeFeatures(png(8, 8)).toSeq)
  }

  test("oracle opaqueness contract: every fixture payload is undecodable, " +
      "so Spark's decode-dispatch and the oracle's byte path agree") {
    // ADVICE r16: q_multimodal_phash/_pairs/_features are oracle-bearing
    // ONLY because the fixture payloads are opaque — the Spark side
    // dispatches through decodeImage/parseWav before the byte stub while
    // the DuckDB oracle replays just the byte path. Assert the
    // assumption where it is made: a fixture regeneration that ever
    // emits a PNG/JPEG/RIFF-prefixed payload fails HERE with the doc_ids
    // named, instead of as an unexplained gate digest mismatch.
    import spark.implicits._
    for (dir <- Seq(TestSpark.sf, "/root/testdata/sf0.01")
         if new java.io.File(s"$dir/documents.parquet").exists) {
      val bad = MediaOps.mediaTable(spark, dir)
        .select("doc_id", "media").as[(Long, Array[Byte])]
        .mapPartitions(_.collect { case (id, b)
            if MediaOps.decodeImage(b).nonEmpty ||
               MediaOps.parseWav(b).nonEmpty => id })
        .take(5)
      assert(bad.isEmpty, s"DECODABLE fixture payloads in $dir " +
        s"(doc_ids ${bad.mkString(",")}) — the byte-path oracle " +
        "assumption behind q_multimodal_phash/_pairs/_features is broken")
    }
  }
}
