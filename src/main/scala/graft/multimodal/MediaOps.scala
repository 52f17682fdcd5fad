package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.Tables

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, plus executor-side batch decode/feature/frame operators
  * (north-star "multimodal columns").
  *
  * IMAGE decode is REAL: `javax.imageio` (ships with every JDK — no
  * external dependency) decodes PNG/JPEG/BMP/GIF payloads to pixels for
  * feature extraction and resizing (MediaSpec round-trips generated
  * PNGs). AUDIO decode is REAL for RIFF/WAV PCM16: [[parseWav]] walks
  * the container chunks and the sample loop is plain byte math
  * ([[pcmFeatures]], [[wavFeatures]]) — no codec dependency. Container
  * METADATA (PNG IHDR dims, WAV format fields) parses header-only, no
  * pixel/sample decode. Only payloads with NO shipped decoder — the
  * fixture's synthetic text-bytes media and true video containers —
  * fall back to the clearly-marked deterministic byte-domain STUB.
  * Either way the dataflow is the 100 TB shape: per-partition iterator
  * processing (one decoder instance per partition, not per row), no
  * driver collection, fixed-width feature output suitable for
  * downstream ANN (graft.operators.Similarity).
  */
object MediaOps {

  case class MediaMeta(kind: String, width: Int, height: Int, sampleRate: Int)
  case class MediaRow(doc_id: Long, media: Array[Byte], kind: String)
  case class FeatureRow(doc_id: Long, features: Array[Float])
  case class FrameRow(doc_id: Long, n_frames: Int, first_frame: Array[Byte])

  /** Media table derived deterministically from the documents fixture:
    * the UTF-8 text bytes stand in for an encoded media payload; `kind`
    * cycles image/audio/video. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        col("text").cast("binary").as("media"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3L)) + 1).cast("int")).as("kind"),
        struct(
          (pmod(col("doc_id"), lit(64L)) * 16 + 16).cast("int").as("width"),
          (pmod(col("doc_id"), lit(48L)) * 16 + 16).cast("int").as("height"),
          lit(16000).as("sampleRate")).as("meta"))

  /** STUB (fallback) histogram counts — 16-bin byte histogram, the
    * exact-integer core behind [[stubDecodeFeatures]] and the
    * oracle-bearing [[qMultimodalFeatures]]. */
  def stubHistCounts(media: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](16)
    var i = 0
    while (i < media.length) {
      hist((media(i) & 0xFF) / 16) += 1L
      i += 1
    }
    hist
  }

  /** STUB (fallback) decoder — stands in for codecs the JDK lacks
    * (audio/video) and absorbs undecodable payloads. Deterministic:
    * 16-bin byte histogram, L1-normalized. */
  def stubDecodeFeatures(media: Array[Byte]): Array[Float] = {
    val n = math.max(media.length, 1).toFloat
    stubHistCounts(media).map(_ / n)
  }

  /** Container-signature sniff — PNG / JPEG / GIF / BMP magic bytes. Real
    * pipelines dispatch on the container magic, not on codec exceptions:
    * at 100 TB the failed-decode exception path (stream + ImageIO reader
    * probe per row) is pure waste for the non-image majority. */
  def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
      (b(0) == 'B' && b(1) == 'M'))

  /** RIFF/WAVE container sniff (the audio analogue of [[looksLikeImage]]). */
  def looksLikeWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)

  /** Parsed WAV container: PCM format fields + the data chunk's span.
    * Header-only — no sample is touched, which is the 100 TB metadata
    * path (census a petabyte of audio by reading 44-byte prefixes). */
  case class WavInfo(audioFormat: Int, channels: Int, sampleRate: Int,
    bitsPerSample: Int, dataOffset: Int, dataBytes: Int)

  /** Strict RIFF chunk walk: fmt + data chunks located by id, unknown
    * chunks skipped by their declared (padded-to-even) size, any
    * malformed length rejected → None → the caller falls back to the
    * stub. A data chunk whose declared size overruns the payload is
    * clipped, not rejected — streamed WAV writers routinely leave a
    * placeholder size. */
  def parseWav(b: Array[Byte]): Option[WavInfo] = {
    if (!looksLikeWav(b)) return None
    var pos = 12
    var fmt: Option[(Int, Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    while (pos + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(b, pos, 4, "US-ASCII")
      val size = le32(b, pos + 4)
      if (size < 0) return None
      id match {
        case "fmt " =>
          if (pos + 8 + 16 > b.length) return None
          fmt = Some((le16(b, pos + 8), le16(b, pos + 10),
            le32(b, pos + 12), le16(b, pos + 22)))
        case "data" =>
          data = Some((pos + 8, math.min(size, b.length - pos - 8)))
        case _ => ()
      }
      pos += 8 + size + (size & 1) // RIFF chunks are word-aligned
      if (pos < 0) return None // overflow guard on hostile sizes
    }
    for ((af, ch, sr, bps) <- fmt; (off, len) <- data)
      yield WavInfo(af, ch, sr, bps, off, len)
  }

  /** PNG IHDR dimensions parsed from the container header alone — the
    * first chunk after the 8-byte signature is IHDR by spec, carrying
    * big-endian width/height. Metadata without pixel decode: at 100 TB
    * the dimension census must not run a codec. */
  def pngDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 24 && b(0) == 0x89.toByte && b(1) == 'P' &&
        b(2) == 'N' && b(3) == 'G' &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some((be32(b, 16), be32(b, 20)))
    else None

  /** Real audio features for 16-bit PCM WAV payloads: 16-bin
    * L1-normalized AMPLITUDE histogram over the decoded int16 samples
    * (|s|/2048, top bin clamped) — the audio analogue of
    * [[imageFeatures]]'s luminance histogram, deterministic and exact.
    * None for non-WAV / non-PCM16 payloads. */
  def wavFeatures(b: Array[Byte]): Option[Array[Float]] =
    wavHistCounts(b).map { case (hist, n) =>
      hist.map(_ / math.max(n, 1L).toFloat)
    }

  /** Exact-integer core of [[wavFeatures]]: amplitude-bin counts + the
    * decoded sample count. None for non-WAV / non-PCM16 payloads. */
  def wavHistCounts(b: Array[Byte]): Option[(Array[Long], Long)] =
    parseWav(b).filter(w => w.audioFormat == 1 && w.bitsPerSample == 16)
      .map { w =>
        val hist = new Array[Long](16)
        val end = w.dataOffset + w.dataBytes
        var i = w.dataOffset
        var n = 0L
        while (i + 1 < end) {
          val s = (b(i + 1).toInt << 8) | (b(i) & 0xFF)
          hist(math.min(math.abs(s) / 2048, 15)) += 1L
          n += 1
          i += 2
        }
        (hist, n)
      }

  /** Real image decode via the JDK's ImageIO (PNG/JPEG/BMP/GIF). None for
    * payloads whose magic bytes don't match or no registered reader
    * accepts. */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (!looksLikeImage(bytes)) None
    else
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      // NonFatal only: a corrupt payload falls back to the stub, but OOM /
      // task interruption must still fail the task, not fake features
      catch { case scala.util.control.NonFatal(_) => None }

  /** 16-bin L1-normalized LUMINANCE histogram over decoded pixels —
    * integer Rec.601 weights, deterministic across platforms. */
  def imageFeatures(img: java.awt.image.BufferedImage): Array[Float] = {
    val n = math.max(img.getWidth * img.getHeight, 1).toFloat
    imageHistCounts(img).map(_ / n)
  }

  /** Exact-integer core of [[imageFeatures]]: luminance-bin counts. */
  def imageHistCounts(img: java.awt.image.BufferedImage): Array[Long] = {
    val hist = new Array[Long](16)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587
          + (rgb & 0xFF) * 114) / 1000
        hist(lum / 16) += 1L
        x += 1
      }
      y += 1
    }
    hist
  }

  /** Decode: real pixels when an image codec accepts the payload, real
    * PCM16 amplitude features when the bytes are a WAV container, the
    * byte-domain stub ONLY for genuinely opaque payloads (no JDK video
    * codec exists; the fixture's synthetic text-bytes media is opaque by
    * construction). Every decodable container class the engine ships a
    * decoder for routes through its real path — the stub is unreachable
    * for image and PCM-WAV bytes (MediaSpec pins this). */
  def decodeFeatures(media: Array[Byte]): Array[Float] =
    decodeImage(media).map(imageFeatures)
      .orElse(wavFeatures(media))
      .getOrElse(stubDecodeFeatures(media))

  /** The same decode dispatch as [[decodeFeatures]], returning the
    * exact-integer (bin counts, denominator) pair instead of the
    * float-normalized vector — pixels for images, samples for PCM16
    * WAV, bytes for opaque payloads. Both engines can reproduce the
    * ppb readout exactly, which is what makes [[qMultimodalFeatures]]
    * oracle-bearing. */
  def decodeHistCounts(media: Array[Byte]): (Array[Long], Long) =
    decodeImage(media)
      .map(img => (imageHistCounts(img),
        math.max(img.getWidth.toLong * img.getHeight, 1L)))
      .orElse(wavHistCounts(media).map { case (h, n) =>
        (h, math.max(n, 1L))
      })
      .getOrElse((stubHistCounts(media), math.max(media.length.toLong, 1L)))

  /** Batch feature extraction over partitions — the mapInPandas/mapPartitions
    * shape: one iterator pass per partition, constant memory. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[FeatureRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r =>
      FeatureRow(r.doc_id, decodeFeatures(r.media))))
  }

  case class ResizedRow(doc_id: Long, media: Array[Byte])

  /** Real image downscale by `factor`, re-encoded as PNG. */
  def resizeImage(img: java.awt.image.BufferedImage,
      factor: Int): Array[Byte] = {
    val w = math.max(img.getWidth / factor, 1)
    val h = math.max(img.getHeight / factor, 1)
    val out = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.drawImage(img, 0, 0, w, h, null)
    g.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", baos)
    baos.toByteArray
  }

  /** Resize: real pixel downscale (ImageIO) when the payload decodes;
    * deterministic byte-domain downsample (keep every `factor`-th byte)
    * as the non-image fallback. Iterator-in/iterator-out per partition —
    * a real codec adds no per-row JVM↔native churn. */
  def resize(media: Dataset[MediaRow], factor: Int): Dataset[ResizedRow] = {
    import media.sparkSession.implicits._
    require(factor > 0)
    media.mapPartitions(_.map { r =>
      val out = decodeImage(r.media).map(resizeImage(_, factor)).getOrElse {
        val ds = new Array[Byte]((r.media.length + factor - 1) / factor)
        var i = 0
        while (i < ds.length) { ds(i) = r.media(i * factor); i += 1 }
        ds
      }
      ResizedRow(r.doc_id, out)
    })
  }

  /** Frame sampling: slice the payload into fixed-width frames, keep count
    * + first frame (stride in bytes stands in for a time stride). */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val n = (r.media.length + frameBytes - 1) / frameBytes
      val first = r.media.slice(0, math.min(frameBytes, r.media.length))
      FrameRow(r.doc_id, n, first)
    })
  }

  case class AudioRow(doc_id: Long, n_samples: Int, n_frames: Int,
    total_energy: Long, max_frame_energy: Long, zero_crossings: Int)

  /** REAL audio DSP over the binary payload — 16-bit little-endian PCM
    * decode needs no codec, just byte math, so unlike the image path
    * there is no stub anywhere: per-doc sample count, 256-sample frame
    * count, total / max-frame energy (Σ s², exact longs) and
    * zero-crossing count (sign transitions, zeros skipped — the
    * classic voice-activity features). Runs in the same typed
    * per-partition iterator shape as the other media ops, and every
    * output is an exact integer, so the operator sits under a full
    * DuckDB oracle that re-decodes the int16 stream from hex — codec
    * work hash-checked against a second engine. */
  def pcmFeatures(media: Dataset[MediaRow],
      frameSamples: Int = 256): Dataset[AudioRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val b = r.media
      val n = b.length / 2 // truncate a trailing odd byte
      var i = 0; var zc = 0; var total = 0L; var maxE = 0L
      var frameE = 0L; var prevSign = 0
      while (i < n) {
        val lo = b(2 * i) & 0xFF
        val hi = b(2 * i + 1).toInt // signed high byte
        val s = (hi << 8) | lo
        val e = s.toLong * s
        total += e; frameE += e
        val sign = Integer.signum(s)
        if (sign != 0) {
          if (prevSign != 0 && sign != prevSign) zc += 1
          prevSign = sign
        }
        i += 1
        if (i % frameSamples == 0) {
          if (frameE > maxE) maxE = frameE
          frameE = 0L
        }
      }
      if (frameE > maxE) maxE = frameE
      AudioRow(r.doc_id, n, (n + frameSamples - 1) / frameSamples,
        total, maxE, zc)
    })
  }

  // ---- declared queries -------------------------------------------------

  type Q = (SparkSession, String) => DataFrame

  /** Binary payload + typed metadata projection — oracle-checkable
    * (byte lengths, first byte, kind tag). */
  val qMultimodalMeta: Q = (s, d) =>
    mediaTable(s, d)
      .select(col("doc_id"),
        octet_length(col("media")).as("n_bytes"),
        // BYTE-true (hex of the first payload byte, not the codepoint of
        // a UTF-8 decode): media is opaque binary, and the previous
        // ascii(cast-to-string) form silently diverged from the oracle
        // on any multi-byte first character
        conv(hex(substring(col("media"), 1, 1)), 16, 10)
          .cast(IntegerType).as("first_byte"),
        col("kind"),
        col("meta.width").as("width"),
        col("meta.height").as("height"))

  /** Frame sampling through the typed mapPartitions path; frame count and
    * base64 of the first 8-byte frame are exact → oracle-checkable even
    * though the operator itself is imperative. */
  val qMultimodalFrames: Q = (s, d) => {
    import s.implicits._
    val ds = mediaTable(s, d).as[MediaRow]
    sampleFrames(ds, frameBytes = 8).toDF()
      .select(col("doc_id"), col("n_frames"),
        base64(col("first_frame")).as("first_frame_b64"))
  }

  /** Resize through the typed mapPartitions path: downsampled payload
    * length and halved metadata dims are exact → oracle-checkable. */
  val qMultimodalResize: Q = (s, d) => {
    import s.implicits._
    val base = mediaTable(s, d)
    val ds = base.as[MediaRow]
    resize(ds, factor = 4).toDF()
      .select(col("doc_id"), octet_length(col("media")).as("resized_bytes"))
      .join(base.select(col("doc_id"),
        (col("meta.width") / 4).cast("int").as("new_width"),
        (col("meta.height") / 4).cast("int").as("new_height")), "doc_id")
  }

  /** Feature vectors through the full dispatch (real image codec → real
    * WAV PCM16 path → stub only for opaque bytes; the fixture payloads
    * are synthetic text bytes, hence opaque by construction).
    * ORACLE-BEARING since r16: the histogram weights are emitted as
    * exact parts-per-billion longs — bin_count·10⁹ div denominator —
    * instead of float ratios, so DuckDB reproduces every cell from the
    * hex-decoded payload bytes (the q_multimodal_audio precedent). No
    * overflow by construction: a binary cell caps at 2³¹ bytes in both
    * engines, so count·10⁹ < 2⁶². The float [[decodeFeatures]] stays
    * the library surface for ANN consumers. The vector is emitted as
    * its JSON string: the driver's comparator sorts rows through
    * pandas and crashes on ndarray cells. */
  val qMultimodalFeatures: Q = (s, d) => {
    import s.implicits._
    val ds = mediaTable(s, d).as[MediaRow]
    ds.mapPartitions(_.map { r =>
        val (counts, n) = decodeHistCounts(r.media)
        (r.doc_id, counts.map(c => c * 1000000000L / n))
      }).toDF("doc_id", "ppb")
      .select(col("doc_id"), to_json(col("ppb")).as("features_ppb"))
  }

  /** 64-bit average hash (aHash) of a decoded image: downscale to 8×8,
    * grayscale, bit i set iff pixel i's luminance exceeds the 8×8 mean
    * (strict). Near-duplicate images — recompressions, small resizes —
    * land within a few Hamming bits of each other; exact duplicates
    * collide exactly, so a groupBy(phash) IS image-level exact-dup
    * detection and banding the 64 bits gives the LSH near-dup path
    * (the byte-signature recipe [[DedupQueries]] applies to text,
    * replayed on pixels). */
  def aHash(img: java.awt.image.BufferedImage): Long = {
    val small = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = small.createGraphics()
    g.drawImage(img, 0, 0, 8, 8, null)
    g.dispose()
    val lum = new Array[Long](64)
    var i = 0
    while (i < 64) {
      val rgb = small.getRGB(i % 8, i / 8)
      // integer Rec.601 luma — deterministic, no float rounding
      lum(i) = (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
        114L * (rgb & 0xff)) / 1000L
      i += 1
    }
    val avg = lum.sum / 64
    var bits = 0L
    i = 0
    while (i < 64) { if (lum(i) > avg) bits |= (1L << i); i += 1 }
    bits
  }

  /** Byte-domain aHash fallback for undecodable payloads: 64 equal
    * chunks, bit set iff the chunk's mean unsigned byte exceeds the
    * payload mean. Deterministic; same 64-bit contract as [[aHash]]. */
  def byteAHash(b: Array[Byte]): Long = {
    if (b.isEmpty) return 0L
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var i = 0
    while (i < b.length) {
      // long chunk index: i*64 wraps Int for payloads past 2²⁵ bytes
      val c = ((i.toLong * 64) / b.length).toInt
      sums(c) += (b(i) & 0xff); counts(c) += 1
      i += 1
    }
    val total = sums.sum
    var bits = 0L
    var j = 0
    while (j < 64) {
      // chunk mean > global mean, cross-multiplied (no division drift);
      // BigInt: sums·len can pass 2⁶³ near the 2³¹-byte payload cap,
      // and the oracle's HUGEINT compare must match bit-for-bit there
      if (counts(j) > 0 &&
          BigInt(sums(j)) * b.length > BigInt(total) * counts(j))
        bits |= (1L << j)
      j += 1
    }
    bits
  }

  /** Perceptual hash of any payload: real aHash when the image decodes,
    * byte-domain fallback otherwise. */
  def phash(media: Array[Byte]): Long =
    decodeImage(media).map(aHash).getOrElse(byteAHash(media))

  case class PhashRow(doc_id: Long, phash: Long)

  /** Near-duplicate image pairs by LSH banding over the 64-bit aHash:
    * split the hash into four 16-bit bands — two images within Hamming
    * distance 3 of each other must agree on at least one full band
    * (pigeonhole), so candidates meet on a (band, value) equality key,
    * NEVER all-pairs — then verify the exact Hamming distance with
    * bit_count (codegen'd). The text-signature LSH recipe
    * ([[graft.operators.DedupQueries]]) replayed on pixels; at 100 TB
    * the hash table is one narrow long per image and each band bucket
    * is a skew-bounded equality join. */
  def phashNearDupPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= 3,
      "4-band pigeonhole only guarantees recall for Hamming <= 3")
    val banded = hashes.select(col("doc_id"), col("phash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("band_val",
        expr("shiftrightunsigned(phash, band * 16)")
          .bitwiseAND(lit(0xffffL)))
    banded.as("a")
      .join(banded.as("b"), Seq("band", "band_val"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Declared query: per-payload perceptual hash plus the size of its
    * exact-collision bucket (n_same > 1 = image-level duplicates). The
    * hash runs map-side per partition; the one shuffle is the
    * hash-keyed bucket count. ORACLE-BEARING since r16: the fixture's
    * opaque payloads all route through [[byteAHash]], whose chunk-mean
    * bit decisions are pure integer byte arithmetic DuckDB replays from
    * the hex-decoded payload (HUGEINT bit assembly with an explicit
    * two's-complement fold for bit 63). MediaSpec still pins the
    * image-codec branch (identical-pixels collision, near-dup Hamming
    * distance) that the fixture cannot reach. */
  val qMultimodalPhash: Q = (s, d) => {
    import s.implicits._
    val hashes = mediaTable(s, d).as[MediaRow]
      .mapPartitions(_.map(r => PhashRow(r.doc_id, phash(r.media))))
      .toDF()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("phash")
    hashes.select(col("doc_id"), col("phash"),
      count(lit(1)).over(w).as("n_same"))
  }

  /** Declared query (r16): the banded image near-dup join itself —
    * [[phashNearDupPairs]] at Hamming ≤ 3 — evaluated the way image
    * dedup is actually benchmarked: against PLANTED near-duplicates.
    * Each payload gets a deterministic "recompression twin" (doc_id
    * shifted by 10⁹, first payload byte +16 mod 256 — one histogram
    * chunk's sum nudged, so the twin's aHash sits at Hamming 0–2 of
    * the original, while the fixture's 500 distinct organic payloads
    * stay far apart: measured min organic Hamming > 8). On the opaque
    * fixture payloads every hash is the byte-domain [[byteAHash]], so
    * the whole pipeline — hash, band split, bucket equi-join,
    * bit_count verify — is exact integer arithmetic DuckDB replays
    * end-to-end from hex. */
  val qMultimodalPhashPairs: Q = (s, d) => {
    import s.implicits._
    val hashes = mediaTable(s, d).as[MediaRow]
      .mapPartitions(_.flatMap { r =>
        val twin = r.media.clone()
        if (twin.nonEmpty) twin(0) = ((twin(0) + 16) & 0xFF).toByte
        Iterator(PhashRow(r.doc_id, phash(r.media)),
          PhashRow(r.doc_id + 1000000000L, phash(twin)))
      }).toDF()
    phashNearDupPairs(hashes, maxHamming = 3)
  }

  /** PCM feature extraction over the audio-kind payloads. */
  val qMultimodalAudio: Q = (s, d) => {
    import s.implicits._
    val ds = mediaTable(s, d).filter(col("kind") === "audio").as[MediaRow]
    pcmFeatures(ds).toDF()
  }

  val queries: Map[String, Q] = Map(
    "q_multimodal_meta" -> qMultimodalMeta,
    "q_multimodal_frames" -> qMultimodalFrames,
    "q_multimodal_resize" -> qMultimodalResize,
    "q_multimodal_audio" -> qMultimodalAudio,
    "q_multimodal_features" -> qMultimodalFeatures,
    "q_multimodal_phash" -> qMultimodalPhash,
    "q_multimodal_phash_pairs" -> qMultimodalPhashPairs)

  /** Shared oracle CTE chain replaying [[byteAHash]] from the
    * hex-encoded payload: chunk sums, HUGEINT cross-multiplied
    * chunk-mean vs global-mean compares, HUGEINT bit assembly
    * (1::BIGINT << 63 errors in DuckDB), and the two's-complement fold
    * back to the signed long the Spark side carries. `base` must
    * produce `(doc_id, h hex-string, n byte-length)`; exposes
    * `sg(doc_id, hb HUGEINT unsigned, phash BIGINT signed)`. */
  private def phashCtes(base: String) =
    s"""a AS ($base),
         b AS (
           SELECT doc_id, n, (g.i * 64) // n AS chunk,
             CAST('0x' || substring(h, 2 * g.i + 1, 2) AS INT) AS byte
           FROM a, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i) g),
         c AS (
           SELECT doc_id, n, chunk, SUM(byte) AS s, COUNT(*) AS cnt
           FROM b GROUP BY 1, 2, 3),
         t AS (SELECT doc_id, SUM(s) AS total FROM c GROUP BY 1),
         ph AS (
           SELECT c.doc_id,
             SUM(CASE WHEN CAST(c.s AS HUGEINT) * c.n
                        > CAST(t.total AS HUGEINT) * c.cnt
                 THEN 1::HUGEINT << CAST(c.chunk AS INT)
                 ELSE 0::HUGEINT END) AS hbits
           FROM c JOIN t USING (doc_id) GROUP BY c.doc_id),
         sg AS (
           SELECT a.doc_id, COALESCE(ph.hbits, 0::HUGEINT) AS hb,
             CAST(COALESCE(ph.hbits, 0::HUGEINT)
               - CASE WHEN COALESCE(ph.hbits, 0::HUGEINT)
                        >= 9223372036854775808::HUGEINT
                 THEN 18446744073709551616::HUGEINT
                 ELSE 0::HUGEINT END AS BIGINT) AS phash
           FROM a LEFT JOIN ph ON ph.doc_id = a.doc_id)"""

  private val docsBase =
    """SELECT doc_id, hex(encode(text)) AS h,
             octet_length(encode(text)) AS n
           FROM documents"""

  /** [[docsBase]] plus the planted recompression twins (the
    * qMultimodalPhashPairs construction: id +10⁹, first byte +16 mod
    * 256 spliced into the hex string). */
  private val docsWithTwinsBase =
    s"""SELECT doc_id, h, n FROM ($docsBase)
         UNION ALL
         SELECT doc_id + 1000000000,
           CASE WHEN n = 0 THEN h
                ELSE lpad(upper(to_hex(
                    (CAST('0x' || substring(h, 1, 2) AS INT) + 16) % 256)),
                  2, '0') || substring(h, 3) END,
           n
         FROM ($docsBase)"""

  val oracleSql: Map[String, String] = Map(
    "q_multimodal_features" ->
      """WITH a AS (
           SELECT doc_id, hex(encode(text)) AS h,
             octet_length(encode(text)) AS n
           FROM documents),
         b AS (
           SELECT doc_id,
             CAST('0x' || substring(h, 2 * g.i + 1, 2) AS INT) // 16 AS bin
           FROM a, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i) g),
         c AS (SELECT doc_id, bin, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
         d AS (
           SELECT a.doc_id, bins.bin,
             COALESCE(c.cnt, 0) * 1000000000 // GREATEST(a.n, 1) AS ppb
           FROM a
           CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS bin) bins
           LEFT JOIN c ON c.doc_id = a.doc_id AND c.bin = bins.bin)
         SELECT doc_id,
           '[' || string_agg(CAST(ppb AS VARCHAR), ',' ORDER BY bin) || ']'
             AS features_ppb
         FROM d GROUP BY doc_id ORDER BY doc_id""",
    "q_multimodal_phash" ->
      s"""WITH ${phashCtes(docsBase)}
         SELECT doc_id, phash,
           COUNT(*) OVER (PARTITION BY phash) AS n_same
         FROM sg ORDER BY doc_id""",
    "q_multimodal_phash_pairs" ->
      s"""WITH ${phashCtes(docsWithTwinsBase)},
         -- the Spark side's shiftrightunsigned banding over the
         -- UNSIGNED hash (hb), candidates on (band, band_val) equality
         bands AS (
           SELECT doc_id, phash,
             CAST((hb >> (g.band * 16)) & 65535::HUGEINT AS INT)
               AS band_val, g.band
           FROM sg,
             LATERAL (SELECT unnest(generate_series(0, 3)) AS band) g),
         cand AS (
           SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
             CAST(bit_count(xor(x.phash, y.phash)) AS INT) AS hamming
           FROM bands x
           JOIN bands y ON x.band = y.band AND x.band_val = y.band_val
           WHERE x.doc_id < y.doc_id)
         SELECT doc_a, doc_b, hamming FROM cand
         WHERE hamming <= 3 ORDER BY doc_a, doc_b""",
    "q_multimodal_audio" ->
      """WITH a AS (
           SELECT doc_id, hex(encode(text)) AS h,
             octet_length(encode(text)) // 2 AS n
           FROM documents WHERE doc_id % 3 = 1),
         s AS (
           SELECT doc_id, n, g.i,
             CAST('0x' || substring(h, 4 * g.i + 1, 2) AS INT) AS lo,
             CAST('0x' || substring(h, 4 * g.i + 3, 2) AS INT) AS hi
           FROM a, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i) g),
         v AS (
           SELECT doc_id, i, i // 256 AS frame,
             (CASE WHEN hi >= 128 THEN hi - 256 ELSE hi END) * 256 + lo
               AS smp
           FROM s),
         fe AS (
           SELECT doc_id, frame, SUM(CAST(smp AS BIGINT) * smp) AS e
           FROM v GROUP BY doc_id, frame),
         agg AS (
           SELECT doc_id, CAST(SUM(e) AS BIGINT) AS total_energy,
             CAST(MAX(e) AS BIGINT) AS max_frame_energy
           FROM fe GROUP BY doc_id),
         zc AS (
           SELECT doc_id,
             CAST(COUNT(*) FILTER (WHERE prev_sgn IS NOT NULL
               AND sgn <> prev_sgn) AS INT) AS zero_crossings
           FROM (SELECT doc_id,
                   CASE WHEN smp > 0 THEN 1 ELSE -1 END AS sgn,
                   lag(CASE WHEN smp > 0 THEN 1 ELSE -1 END)
                     OVER (PARTITION BY doc_id ORDER BY i) AS prev_sgn
                 FROM v WHERE smp <> 0)
           GROUP BY doc_id)
         SELECT a.doc_id, CAST(a.n AS INT) AS n_samples,
           CAST((a.n + 255) // 256 AS INT) AS n_frames,
           COALESCE(agg.total_energy, 0) AS total_energy,
           COALESCE(agg.max_frame_energy, 0) AS max_frame_energy,
           COALESCE(zc.zero_crossings, 0) AS zero_crossings
         FROM a
         LEFT JOIN agg ON agg.doc_id = a.doc_id
         LEFT JOIN zc ON zc.doc_id = a.doc_id
         ORDER BY a.doc_id""",
    "q_multimodal_meta" ->
      """SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           -- first PAYLOAD BYTE via hex slicing (DuckDB cannot slice
           -- BLOBs directly); byte-true like the Spark side
           CAST('0x' || substring(hex(encode(text)), 1, 2) AS INT)
             AS first_byte,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           CAST((doc_id % 64) * 16 + 16 AS INT) AS width,
           CAST((doc_id % 48) * 16 + 16 AS INT) AS height
         FROM documents ORDER BY doc_id""",
    "q_multimodal_resize" ->
      """SELECT doc_id,
           CAST((octet_length(encode(text)) + 3) // 4 AS INT) AS resized_bytes,
           CAST(((doc_id % 64) * 16 + 16) // 4 AS INT) AS new_width,
           CAST(((doc_id % 48) * 16 + 16) // 4 AS INT) AS new_height
         FROM documents ORDER BY doc_id""",
    "q_multimodal_frames" ->
      """SELECT doc_id,
           CAST((octet_length(encode(text)) + 7) // 8 AS INT) AS n_frames,
           -- first 8 PAYLOAD BYTES via hex slicing: the previous
           -- substring(text, 1, 8) took 8 CHARACTERS, which diverges
           -- from the Spark side's byte slice on non-ASCII payloads
           to_base64(unhex(substring(hex(encode(text)), 1, 16)))
             AS first_frame_b64
         FROM documents ORDER BY doc_id""")
}
