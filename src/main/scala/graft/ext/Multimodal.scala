package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: media payloads travel as opaque `binary`
  * columns with typed metadata extracted by a per-partition batch decoder.
  *
  * The decode itself is imperative by nature (codec libraries), so this is
  * the one place the engine deliberately leaves Catalyst: a typed
  * `mapPartitions` whose iterator shape lets a real implementation batch
  * frames into a native decoder. [[decodeBatch]] dispatches on magic
  * bytes: BMP, WAV, and PNG payloads get REAL pure-JVM header parses (no codec
  * dependency needed for container metadata); anything else falls back to
  * a clearly-marked deterministic STUB (this container ships no
  * image/audio codecs), so the pipeline never throws on junk bytes. The
  * Spark-side plumbing — binary column, schema, encoders, partition-batch
  * signature — is what the 100 TB path needs: decode parallelism =
  * partition count, no driver involvement, columnar binary at rest.
  */
object Multimodal {

  /** Typed media-metadata row produced by the decoder. For audio (WAV)
    * the image-shaped fields carry: width = sample rate, height =
    * channel count, n_frames = sample frames (data bytes / block align).
    */
  case class MediaMeta(
      doc_id: Long, n_bytes: Int, width: Int, height: Int, n_frames: Int)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Real decode: BMP `BM` header — width/height from the DIB header
    * (BITMAPINFOHEADER int32s; the legacy 12-byte BITMAPCOREHEADER
    * uint16s). Height may be negative for top-down rows → abs.
    */
  private def decodeBmp(id: Long, b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 26 || b(0) != 'B' || b(1) != 'M') return None
    val dib = le32(b, 14)
    val meta =
      if (dib >= 40)
        Some(MediaMeta(id, b.length, le32(b, 18), math.abs(le32(b, 22)), 1))
      else if (dib == 12)
        Some(MediaMeta(id, b.length, le16(b, 18), le16(b, 20), 1))
      else None
    // corrupt headers (non-positive dimensions) fall through to the stub
    meta.filter(m => m.width > 0 && m.height > 0)
  }

  /** Real decode: WAV `RIFF….WAVE` — walk the chunk list for `fmt `
    * (channels, sample rate, block align) and `data` (payload size);
    * frames = data size / block align.
    */
  private def decodeWav(id: Long, b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE")
      return None
    var off = 12
    var rate, channels, blockAlign, dataSize = -1
    while (off + 8 <= b.length) {
      val id4 = tag(b, off)
      val sz = le32(b, off + 4)
      // sz >= 16: a corrupt fmt chunk declaring fewer bytes must not have
      // its fields read from the NEXT chunk's bytes (plausible-but-wrong
      // meta); fall through to the stub instead
      if (id4 == "fmt " && sz >= 16 && off + 8 + 16 <= b.length) {
        channels = le16(b, off + 10)
        rate = le32(b, off + 12)
        blockAlign = le16(b, off + 20)
      }
      // a declared size past the payload end (corrupt/truncated) must
      // neither advance the walk (Int overflow on `off + sz` would turn
      // the offset negative and crash the tag read) nor be TRUSTED: a
      // fabricated data size would otherwise become a ~2^29 n_frames and
      // explode sampleFrames
      if (sz < 0 || sz > b.length - off - 8) off = b.length
      else {
        if (id4 == "data") dataSize = sz
        off += 8 + sz + (sz & 1) // chunks are word-aligned
      }
    }
    if (rate <= 0 || blockAlign <= 0 || dataSize < 0) None
    else Some(MediaMeta(id, b.length, rate, channels, dataSize / blockAlign))
  }

  /** Waveform statistics row: real signal-level audio features. */
  case class AudioStats(doc_id: Long, n_samples: Long, rms: Double,
      zcr: Double, peak: Double)

  /** REAL PCM waveform feature extraction: for 16-bit PCM WAV payloads,
    * decode the interleaved samples of the `data` chunk and compute the
    * standard cheap audio-quality features — RMS level, zero-crossing
    * rate (both over channel-0 samples, normalized to [-1, 1]), and
    * peak amplitude. These are the silence/clipping/noise signals an
    * audio-corpus gate filters on, computed from the actual samples,
    * not the header. Non-WAV / non-PCM16 payloads return None rows —
    * callers keep or route them as unscoreable, the same fall-through
    * contract as the header decoders.
    *
    * Same chunk-walk hardening as [[decodeWav]]: declared sizes past the
    * payload end are never trusted.
    */
  private[graft] def wavPcm16Stats(id: Long, b: Array[Byte])
      : Option[AudioStats] = {
    if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE")
      return None
    var off = 12
    var fmtCode, channels, bits = -1
    var dataOff, dataSize = -1
    while (off + 8 <= b.length) {
      val id4 = tag(b, off)
      val sz = le32(b, off + 4)
      if (id4 == "fmt " && sz >= 16 && off + 8 + 16 <= b.length) {
        fmtCode = le16(b, off + 8)
        channels = le16(b, off + 10)
        bits = le16(b, off + 22)
      }
      if (sz < 0 || sz > b.length - off - 8) off = b.length
      else {
        if (id4 == "data") { dataOff = off + 8; dataSize = sz }
        off += 8 + sz + (sz & 1)
      }
    }
    if (fmtCode != 1 || bits != 16 || channels <= 0 || dataOff < 0)
      return None
    val frameBytes = 2 * channels
    val n = dataSize / frameBytes
    if (n == 0) return Some(AudioStats(id, 0L, 0.0, 0.0, 0.0))
    var i = 0
    var sumSq = 0.0
    var peak = 0.0
    var crossings = 0L
    var prevSign = 0
    while (i < n) {
      // channel 0 of frame i, little-endian signed 16-bit
      val o = dataOff + i * frameBytes
      val s = ((b(o) & 0xFF) | (b(o + 1) << 8)).toShort.toInt
      val v = s / 32768.0
      sumSq += v * v
      val a = math.abs(v)
      if (a > peak) peak = a
      val sign = if (s > 0) 1 else if (s < 0) -1 else 0
      if (sign != 0) {
        if (prevSign != 0 && sign != prevSign) crossings += 1
        prevSign = sign
      }
      i += 1
    }
    Some(AudioStats(id, n.toLong, math.sqrt(sumSq / n),
      crossings.toDouble / n, peak))
  }

  /** Partition-batched waveform-stats pass over binary payloads — the
    * audio analog of [[extractFeatures]], producing one [[AudioStats]]
    * row per decodable PCM16 WAV. Per-row imperative sample loop inside
    * `mapPartitions` (an `Expression` genuinely doesn't fit byte-level
    * codec walks); everything upstream/downstream stays declarative.
    */
  def extractAudioStats(spark: SparkSession, docs: DataFrame)
      : Dataset[AudioStats] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        wavPcm16Stats(id, bytes)
      })
  }

  /** Real decode: RIFF AVI — walk the top-level chunk list for the
    * `LIST hdrl` container and read the `avih` MainAVIHeader
    * (dwTotalFrames at +16, dwWidth/dwHeight at +32/+36 of its data).
    * Same corrupt-size guards as the WAV walk: a declared size past the
    * payload end neither advances the walk nor is trusted.
    */
  private def decodeAvi(id: Long, b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 24 || tag(b, 0) != "RIFF" || tag(b, 8) != "AVI ")
      return None
    var off = 12
    while (off + 12 <= b.length) {
      val id4 = tag(b, off)
      val sz = le32(b, off + 4)
      if (sz < 0 || sz > b.length - off - 8) return None
      if (id4 == "LIST" && tag(b, off + 8) == "hdrl") {
        // walk inside the hdrl list for the avih chunk
        var in = off + 12
        val end = off + 8 + sz
        while (in + 8 <= end) {
          val cid = tag(b, in)
          val csz = le32(b, in + 4)
          if (csz < 0 || csz > end - in - 8) return None
          if (cid == "avih" && csz >= 40 && in + 8 + 40 <= b.length) {
            val d = in + 8
            val frames = le32(b, d + 16)
            val w = le32(b, d + 32)
            val h = le32(b, d + 36)
            return if (w > 0 && h > 0 && frames >= 0)
              Some(MediaMeta(id, b.length, w, h, frames)) else None
          }
          in += 8 + csz + (csz & 1)
        }
        return None
      }
      off += 8 + sz + (sz & 1)
    }
    None
  }

  /** The video frame chunks of a RIFF AVI payload, in stream order:
    * every `##db`/`##dc` chunk inside the `LIST movi` container (audio
    * `##wb` and index chunks are skipped). None when the payload is not
    * a well-formed AVI — callers fall back to the stub.
    */
  private def aviVideoFrames(b: Array[Byte]): Option[Vector[Array[Byte]]] = {
    if (b.length < 24 || tag(b, 0) != "RIFF" || tag(b, 8) != "AVI ")
      return None
    var off = 12
    while (off + 12 <= b.length) {
      val id4 = tag(b, off)
      val sz = le32(b, off + 4)
      if (sz < 0 || sz > b.length - off - 8) return None
      if (id4 == "LIST" && tag(b, off + 8) == "movi") {
        var in = off + 12
        val end = off + 8 + sz
        val frames = Vector.newBuilder[Array[Byte]]
        while (in + 8 <= end) {
          val cid = tag(b, in)
          val csz = le32(b, in + 4)
          if (csz < 0 || csz > end - in - 8) return None
          // video chunks: two stream digits + "db" (uncompressed) or
          // "dc" (compressed)
          if (cid.length == 4 && cid(0).isDigit && cid(1).isDigit &&
            cid(2) == 'd' && (cid(3) == 'b' || cid(3) == 'c'))
            frames += java.util.Arrays.copyOfRange(b, in + 8, in + 8 + csz)
          in += 8 + csz + (csz & 1)
        }
        return Some(frames.result())
      }
      off += 8 + sz + (sz & 1)
    }
    None
  }

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)

  /** Real decode: JPEG — walk the marker segments from SOI (FFD8) to the
    * first frame header (SOF0–SOF15, excluding the DHT/JPG/DAC table
    * markers FFC4/FFC8/FFCC), whose payload carries height then width as
    * big-endian uint16s after the 1-byte sample precision. Standalone
    * markers (TEM, RSTn) and FF fill bytes are skipped per the spec;
    * hitting SOS/EOI before any SOF, losing marker sync, or a truncated
    * segment falls through to the stub.
    */
  private def decodeJpeg(id: Long, b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8)
      return None
    var i = 2
    while (i + 1 < b.length) {
      if ((b(i) & 0xFF) != 0xFF) return None // lost marker sync
      val m = b(i + 1) & 0xFF
      if (m == 0xFF) i += 1 // fill byte before the marker
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) i += 2 // standalone
      else if (m == 0xD9 || m == 0xDA) return None // EOI/SOS before SOF
      else {
        if (i + 3 >= b.length) return None
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
          if (len < 7) return None
          val h = be16(b, i + 5)
          val w = be16(b, i + 7)
          return if (w > 0 && h > 0) Some(MediaMeta(id, b.length, w, h, 1))
          else None
        }
        i += 2 + len
      }
    }
    None
  }

  /** Real decode: PNG — the 8-byte signature followed by the IHDR chunk
    * (big-endian width/height at fixed offsets 16/20; IHDR is required
    * first by the spec). No codec needed for container metadata.
    */
  private def decodePng(id: Long, b: Array[Byte]): Option[MediaMeta] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    if (b.length < 24 || !b.take(8).sameElements(sig)) return None
    // first chunk must be IHDR; a non-conforming stream falls to the stub
    if (tag(b, 12) != "IHDR" || be32(b, 8) < 13) return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w > 0 && h > 0) Some(MediaMeta(id, b.length, w, h, 1)) else None
  }

  /** STUB decode for payloads matching none of the real header parsers
    * (BMP/WAV/PNG/JPEG/AVI): derives
    * fake-but-deterministic media properties from an md5 of the payload.
    * A real build swaps this arm for a codec call; nothing upstream or
    * downstream changes.
    */
  private def decodeStub(md: MessageDigest, id: Long,
      bytes: Array[Byte]): MediaMeta = {
    md.reset()
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    val hv = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    MediaMeta(
      doc_id = id,
      n_bytes = bytes.length,
      width = (32 * (1 + hv % 8)).toInt,
      height = (32 * (1 + (hv / 8) % 8)).toInt,
      n_frames = (1 + hv % 16).toInt)
  }

  /** Partition-batch decoder: real BMP/WAV/PNG/JPEG/AVI header parse
    * when the magic matches, deterministic stub otherwise.
    */
  def decodeBatch(payloads: Iterator[(Long, Array[Byte])]): Iterator[MediaMeta] = {
    val md = MessageDigest.getInstance("MD5") // one instance per partition batch
    payloads.map { case (id, bytes) =>
      decodeBmp(id, bytes)
        .orElse(decodeWav(id, bytes))
        .orElse(decodePng(id, bytes))
        .orElse(decodeJpeg(id, bytes))
        .orElse(decodeAvi(id, bytes))
        .getOrElse(decodeStub(md, id, bytes))
    }
  }

  /** Attach a binary payload column (here: utf-8 text bytes standing in
    * for image/audio payloads) and run the partition-batched decoder.
    */
  def extractMeta(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(decodeBatch)
  }

  /** Feature row: a fixed-width float vector per payload, the shape an
    * embedding/similarity stage consumes downstream.
    */
  case class MediaFeatures(doc_id: Long, features: Array[Float])

  /** Feature extraction over binary payloads: a REAL 16-bin byte
    * histogram, L1-normalized — deterministic, codec-free, and the same
    * partition-batched plumbing a learned feature extractor (the
    * obvious swap-in) would use. Output plugs directly into the
    * [[Similarity]] operators (`Array[Float]` column).
    */
  def extractFeatures(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val h = new Array[Float](16)
          var i = 0
          while (i < bytes.length) {
            h((bytes(i) & 0xFF) >>> 4) += 1f
            i += 1
          }
          val n = math.max(1, bytes.length).toFloat
          var b = 0
          while (b < 16) { h(b) /= n; b += 1 }
          MediaFeatures(id, h)
        }
      }
  }

  /** Resized media row: payload stays binary, dimensions carried as typed
    * metadata next to it — the at-rest shape for multimodal training data.
    */
  case class ResizedMedia(
      doc_id: Long, width: Int, height: Int, payload: Array[Byte])

  /** Uncompressed BMP opened for pixel access: BITMAPINFOHEADER, BI_RGB,
    * 24 or 32 bpp — the subset a pure-JVM resize can decode without any
    * codec dependency. `bgr` addresses pixels with y = 0 at the TOP row
    * regardless of the file's row order (negative height = top-down).
    */
  private case class BmpPixels(w: Int, h: Int, bpp: Int, topDown: Boolean,
      dataOffset: Int, bytes: Array[Byte]) {
    val rowStride: Int = ((w * (bpp / 8)) + 3) & ~3
    def bgr(x: Int, y: Int): (Byte, Byte, Byte) = {
      val row = if (topDown) y else h - 1 - y
      val off = dataOffset + row * rowStride + x * (bpp / 8)
      (bytes(off), bytes(off + 1), bytes(off + 2))
    }
  }

  private def decodeBmpPixels(b: Array[Byte]): Option[BmpPixels] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    if (le32(b, 14) < 40) return None // info-header family only
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val bpp = le16(b, 28)
    if (le32(b, 30) != 0 || (bpp != 24 && bpp != 32)) return None // BI_RGB
    val h = math.abs(hRaw)
    val dataOffset = le32(b, 10)
    if (w <= 0 || h <= 0) return None
    val stride = ((w * (bpp / 8)) + 3) & ~3
    // a truncated payload must fall to the stub, not crash the executor
    if (dataOffset < 54 || dataOffset.toLong + stride.toLong * h > b.length)
      return None
    Some(BmpPixels(w, h, bpp, hRaw < 0, dataOffset, b))
  }

  /** Minimal 24-bpp bottom-up BI_RGB encoder (54-byte header + padded
    * rows) — the re-encode half of the BMP resize path.
    */
  private def encodeBmp24(w: Int, h: Int,
      bgrAt: (Int, Int) => (Byte, Byte, Byte)): Array[Byte] = {
    val stride = ((w * 3) + 3) & ~3
    val out = new Array[Byte](54 + stride * h)
    def le32w(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte
      out(off + 1) = ((v >> 8) & 0xFF).toByte
      out(off + 2) = ((v >> 16) & 0xFF).toByte
      out(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32w(2, out.length); le32w(10, 54)
    le32w(14, 40); le32w(18, w); le32w(22, h)
    out(26) = 1; out(28) = 24 // planes, bpp (le16, high bytes zero)
    le32w(34, stride * h)
    le32w(38, 2835); le32w(42, 2835) // 72 DPI
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (bb, g, r) = bgrAt(x, y)
        val off = 54 + (h - 1 - y) * stride + x * 3
        out(off) = bb; out(off + 1) = g; out(off + 2) = r
        x += 1
      }
      y += 1
    }
    out
  }

  /** Straight-line PNG pixel decode — signature + chunk walk, IDAT
    * concatenation, `java.util.zip.Inflater` (zlib ships in the JDK; no
    * codec dependency), then per-scanline unfilter of all five standard
    * filter types (None/Sub/Up/Average/Paeth, RFC 2083 §6). Supported
    * subset: 8-bit-depth truecolor (color type 2, RGB) and
    * truecolor+alpha (type 6, RGBA), non-interlaced — what encoders
    * actually emit for photographic training data. Anything else
    * (palette, 16-bit, Adam7) falls to the metadata-only stub arm.
    */
  private case class PngPixels(w: Int, h: Int, channels: Int,
      data: Array[Byte])

  /** Dimension cap for the pixel decode: declared w×h beyond this (256 MB
    * of scanline bytes) falls to the metadata stub instead of allocating —
    * a few-hundred-byte payload can declare 2^30-pixel dimensions, and
    * unchecked Int arithmetic on them throws NegativeArraySizeException
    * (or OOMs) out of the executor task.
    */
  private val MaxPngDecodeBytes = 256L << 20

  private def decodePngPixels(b: Array[Byte]): Option[PngPixels] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    if (b.length < 45 || !b.take(8).sameElements(sig)) return None
    if (tag(b, 12) != "IHDR" || be32(b, 8) < 13) return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    val bitDepth = b(24) & 0xFF
    val colorType = b(25) & 0xFF
    val interlace = b(28) & 0xFF
    if (w <= 0 || h <= 0 || bitDepth != 8 || interlace != 0 ||
        (colorType != 2 && colorType != 6)) return None
    val channels = if (colorType == 2) 3 else 4
    if (h.toLong * (1L + w.toLong * channels) > MaxPngDecodeBytes)
      return None
    // concatenate IDAT chunk payloads (the zlib stream may be split)
    val idat = new java.io.ByteArrayOutputStream()
    var pos = 8
    var sawEnd = false
    while (!sawEnd && pos + 12 <= b.length) {
      val len = be32(b, pos)
      val typ = tag(b, pos + 4)
      if (len < 0 || pos + 12L + len > b.length) return None
      if (typ == "IDAT") idat.write(b, pos + 8, len)
      if (typ == "IEND") sawEnd = true
      pos += 12 + len
    }
    if (idat.size() == 0) return None
    val stride = 1 + w * channels // filter byte + scanline
    val raw = new Array[Byte](h * stride)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        // any zero-progress state bails: truncated stream (needsInput),
        // but also a preset-dictionary header (needsDictionary) — looping
        // on the latter would spin the executor task forever
        if (n == 0) return None
        got += n
      }
      if (got < raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // unfilter in place into the output plane
    val out = new Array[Byte](w * h * channels)
    val bpp = channels
    var y = 0
    while (y < h) {
      val filter = raw(y * stride) & 0xFF
      val rowIn = y * stride + 1
      val rowOut = y * w * channels
      val prevOut = rowOut - w * channels
      var i = 0
      while (i < w * channels) {
        val x = raw(rowIn + i) & 0xFF
        val a = if (i >= bpp) out(rowOut + i - bpp) & 0xFF else 0
        val up = if (y > 0) out(prevOut + i) & 0xFF else 0
        val c = if (y > 0 && i >= bpp) out(prevOut + i - bpp) & 0xFF else 0
        val v = filter match {
          case 0 => x
          case 1 => x + a
          case 2 => x + up
          case 3 => x + ((a + up) / 2)
          case 4 => // Paeth predictor
            val p = a + up - c
            val pa = math.abs(p - a)
            val pb = math.abs(p - up)
            val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
          case _ => return None
        }
        out(rowOut + i) = (v & 0xFF).toByte
        i += 1
      }
      y += 1
    }
    Some(PngPixels(w, h, channels, out))
  }

  /** Minimal PNG encoder (filter-0 scanlines, one deflated IDAT,
    * `java.util.zip.Deflater` + `CRC32` from the JDK) — the re-encode
    * half of the PNG resize path. Emits 8-bit color type 2/6 to match
    * [[decodePngPixels]]'s subset.
    */
  private def encodePng(w: Int, h: Int, channels: Int,
      rgbaAt: (Int, Int) => Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def be32w(v: Int): Array[Byte] = Array(
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def chunk(typ: String, body: Array[Byte]): Unit = {
      bos.write(be32w(body.length))
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(body)
      bos.write(tb); bos.write(body); bos.write(be32w(crc.getValue.toInt))
    }
    bos.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte))
    val colorType = if (channels == 3) 2 else 6
    chunk("IHDR", be32w(w) ++ be32w(h) ++
      Array(8.toByte, colorType.toByte, 0.toByte, 0.toByte, 0.toByte))
    val raw = new Array[Byte](h * (1 + w * channels))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val px = rgbaAt(x, y)
        System.arraycopy(px, 0, raw, y * (1 + w * channels) + 1 + x * channels,
          channels)
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](8192)
    val zs = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) zs.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk("IDAT", zs.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  /** Media resize to (maxW, maxH)-bounded dimensions: REAL for
    * uncompressed 24/32-bpp BI_RGB BMP payloads (pure-JVM nearest-
    * neighbor downscale, re-encoded 24-bpp) and for 8-bit RGB/RGBA
    * non-interlaced PNG ([[decodePngPixels]]'s JDK-Inflater decode,
    * re-encoded through [[encodePng]]) — and a payload-preserving
    * STUB for formats still needing a codec (JPEG entropy decode, …),
    * which carries the bounded dimensions as metadata only. Batch
    * shape, schema, and partition parallelism are identical on all arms,
    * so a codec build swaps the stub without touching anything upstream
    * or downstream.
    */
  def resize(spark: SparkSession, docs: DataFrame,
      maxW: Int, maxH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    def bounded(w: Int, h: Int): (Int, Int) = {
      val scale = math.min(1.0,
        math.min(maxW.toDouble / w, maxH.toDouble / h))
      (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
    }
    docs
      .select(col("doc_id").cast("long"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeBmpPixels(bytes) match {
            case Some(px) =>
              val (dw, dh) = bounded(px.w, px.h)
              if (dw == px.w && dh == px.h) ResizedMedia(id, dw, dh, bytes)
              else ResizedMedia(id, dw, dh,
                encodeBmp24(dw, dh,
                  (x, y) => px.bgr(x * px.w / dw, y * px.h / dh)))
            case None => decodePngPixels(bytes) match {
              case Some(px) =>
                val (dw, dh) = bounded(px.w, px.h)
                if (dw == px.w && dh == px.h) ResizedMedia(id, dw, dh, bytes)
                else ResizedMedia(id, dw, dh,
                  encodePng(dw, dh, px.channels, (x, y) => {
                    val sx = x * px.w / dw
                    val sy = y * px.h / dh
                    val off = (sy * px.w + sx) * px.channels
                    java.util.Arrays.copyOfRange(px.data, off,
                      off + px.channels)
                  }))
              case None =>
                val m = decodeBatch(Iterator((id, bytes))).next()
                val (dw, dh) = bounded(m.width, m.height)
                ResizedMedia(id, dw, dh, bytes)
            }
          }
        }
      }
  }

  /** Frame sampling: every `stride`-th frame as its own row (doc_id,
    * frame_idx, frame payload) — the explode-shaped decode a video
    * pipeline needs. REAL for RIFF AVI payloads: the emitted bytes are
    * the actual `##db`/`##dc` video chunks from the `movi` list. STUB
    * for containers needing a codec: deterministic fake frame bytes
    * (stride over the decoder's n_frames, md5-keyed payload slices),
    * same schema and partition-batch shape.
    */
  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  def sampleFrames(spark: SparkSession, docs: DataFrame,
      stride: Int): Dataset[Frame] = {
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          aviVideoFrames(bytes) match {
            case Some(frames) =>
              (0 until frames.length by stride)
                .map(f => Frame(id, f, frames(f)))
            case None =>
              val m = decodeBatch(Iterator((id, bytes))).next()
              (0 until m.n_frames by stride).map { f =>
                val start = (f * 7) % math.max(1, bytes.length)
                Frame(id, f,
                  bytes.slice(start, math.min(bytes.length, start + 16)))
              }
          }
        }
      }
  }
}
