package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media travel as opaque `binary` columns with typed metadata,
  * and decode / feature-extract / frame-sample run as batched
  * per-partition functions (the Scala analog of `mapInPandas` batches —
  * one buffer reused per partition, schema declared up front).
  *
  * Image and audio decoding are REAL format parsers, pure JVM:
  *   - PNG: signature check, IHDR parse, CRC32 verification, zlib IDAT
  *     inflate (java.util.zip.Inflater), scanline de-filtering (filter
  *     types 0/1/2) → raw pixels.
  *   - WAV: RIFF/WAVE container walk, fmt chunk (PCM) parse, data chunk →
  *     raw samples.
  * The synthetic corpus generator EMITS real PNG and WAV files (with real
  * CRCs and real deflate streams), so the decoders run against genuine
  * format bytes and malformed-input paths are testable by corruption.
  *
  * Video rows are REAL AVI files (RIFF container: hdrl LIST with avih main
  * header + strl stream header for a 'vids' stream, movi LIST with one
  * word-aligned chunk per frame) in BOTH common frame codecs — the demux
  * ([[decodeAvi]]) walks genuine format bytes exactly like the WAV path
  * walks RIFF/WAVE, and the pixel decoder follows the stream header's
  * biCompression: uncompressed BI_RGB '00db' chunks are REAL
  * device-independent bitmaps (24-bit BGR, bottom-up rows padded to 4
  * bytes, [[decodeDib]]), MJPG '00dc' chunks are REAL baseline JPEGs
  * ([[decodeJpegGray]], via the JDK's public javax.imageio codec) — so
  * video features and frame sampling run on actual pixels end-to-end,
  * like the PNG path.
  */
object Multimodal {

  case class Media(media_id: Long, kind: String, blob: Array[Byte])
  /** width/height: pixels (image/video) or sample-rate/channels (audio);
    * n_frames: frames (video), samples (audio), 1 (image). */
  case class MediaMeta(media_id: Long, kind: String, width: Int, height: Int,
                       n_frames: Int, payload_bytes: Int, valid: Boolean)
  case class MediaFeature(media_id: Long, kind: String, features: Array[Double])
  case class Frame(media_id: Long, frame_no: Int, frame: Array[Byte])

  // ---------------------------------------------------------------------
  // PNG encode (generator) + decode — RFC 2083, gray 8-bit, filter 0/1/2
  // ---------------------------------------------------------------------

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32
    val tagB = tag.getBytes(StandardCharsets.US_ASCII)
    crc.update(tagB); crc.update(body)
    be32(body.length) ++ tagB ++ body ++ be32(crc.getValue.toInt)
  }

  /** Minimal real PNG: grayscale 8-bit, one IDAT, filter byte 0 per row. */
  def encodePng(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height)
    val ihdr = be32(width) ++ be32(height) ++
      Array[Byte](8 /*depth*/ , 0 /*gray*/ , 0, 0, 0)
    val raw = new Array[Byte]((width + 1) * height)
    var y = 0
    while (y < height) {
      raw(y * (width + 1)) = 0 // filter: None
      System.arraycopy(pixels, y * width, raw, y * (width + 1) + 1, width)
      y += 1
    }
    val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw); deflater.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.empty)
  }

  /** Real PNG decode: returns (width, height, pixels) or None if malformed
    * (bad signature, CRC mismatch, bad inflate, unsupported layout). */
  def decodePng(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    try {
      if (b.length < 8 || !b.take(8).sameElements(PngSig)) return None
      def u32(o: Int): Int =
        ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) |
          ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)
      var off = 8
      var w = -1; var h = -1
      val idat = new java.io.ByteArrayOutputStream()
      while (off + 8 <= b.length) {
        val len = u32(off)
        val tag = new String(b, off + 4, 4, StandardCharsets.US_ASCII)
        if (off + 12 + len > b.length) return None
        val crc = new java.util.zip.CRC32
        crc.update(b, off + 4, 4 + len)
        if (crc.getValue.toInt != u32(off + 8 + len)) return None
        tag match {
          case "IHDR" =>
            w = u32(off + 8); h = u32(off + 12)
            // depth 8, colortype 0 (gray), deflate, no interlace only
            if (b(off + 16) != 8 || b(off + 17) != 0 || b(off + 20) != 0) return None
          case "IDAT" => idat.write(b, off + 8, len)
          case _ => ()
        }
        off += 12 + len
      }
      if (w <= 0 || h <= 0 || idat.size == 0) return None
      val inflater = new java.util.zip.Inflater()
      inflater.setInput(idat.toByteArray)
      val raw = new Array[Byte]((w + 1) * h)
      var got = 0
      var stalled = false
      // inflate returns 0 without finishing when the deflate stream is
      // truncated (needsInput with nothing left to feed) — a valid-CRC but
      // short IDAT must yield None, never a spin
      while (got < raw.length && !inflater.finished() && !stalled) {
        val n = inflater.inflate(raw, got, raw.length - got)
        if (n == 0) stalled = true else got += n
      }
      inflater.end()
      if (got != raw.length) return None
      val px = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        val f = raw(y * (w + 1))
        var x = 0
        while (x < w) {
          val cur = raw(y * (w + 1) + 1 + x).toInt
          val v: Int = f match {
            case 0 => cur
            case 1 => cur + (if (x > 0) px(y * w + x - 1) else 0)
            case 2 => cur + (if (y > 0) px((y - 1) * w + x) else 0)
            case _ => return None
          }
          px(y * w + x) = v.toByte
          x += 1
        }
        y += 1
      }
      Some((w, h, px))
    } catch { case _: Exception => None }
  }

  // ---------------------------------------------------------------------
  // WAV encode (generator) + decode — canonical RIFF/WAVE PCM
  // ---------------------------------------------------------------------

  private def le16(v: Int) = Array(v.toByte, (v >>> 8).toByte)
  private def le32(v: Int) =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  /** Minimal real WAV: PCM 8-bit mono/stereo. */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Byte]): Array[Byte] = {
    val fmt = le16(1) ++ le16(channels) ++ le32(sampleRate) ++
      le32(sampleRate * channels) ++ le16(channels) ++ le16(8)
    "RIFF".getBytes(StandardCharsets.US_ASCII) ++ le32(36 + samples.length) ++
      "WAVE".getBytes(StandardCharsets.US_ASCII) ++
      "fmt ".getBytes(StandardCharsets.US_ASCII) ++ le32(16) ++ fmt ++
      "data".getBytes(StandardCharsets.US_ASCII) ++ le32(samples.length) ++ samples
  }

  /** Real WAV decode: (sampleRate, channels, samples) or None. */
  def decodeWav(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    try {
      def tag(o: Int) = new String(b, o, 4, StandardCharsets.US_ASCII)
      def u16(o: Int) = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
      def u32(o: Int) = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
        ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
      if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var off = 12
      var rate = -1; var ch = -1
      var data: Array[Byte] = null
      while (off + 8 <= b.length) {
        val t = tag(off); val len = u32(off + 4)
        if (off + 8 + len > b.length) return None
        t match {
          case "fmt " =>
            if (u16(off + 8) != 1) return None // PCM only
            ch = u16(off + 10); rate = u32(off + 12)
          case "data" => data = java.util.Arrays.copyOfRange(b, off + 8, off + 8 + len)
          case _ => ()
        }
        off += 8 + len + (len & 1) // chunks are word-aligned
      }
      if (rate <= 0 || ch <= 0 || data == null) None else Some((rate, ch, data))
    } catch { case _: Exception => None }
  }

  // ---------------------------------------------------------------------
  // AVI encode (generator) + demux — RIFF 'AVI ', avih/strl headers, movi
  // frame chunks ('00db' uncompressed DIB or '00dc' MJPG) — plus the DIB
  // and JPEG frame pixel codecs.
  // ---------------------------------------------------------------------

  private def fourcc(s: String) = s.getBytes(StandardCharsets.US_ASCII)

  private def riffChunk(tag: String, body: Array[Byte]): Array[Byte] = {
    val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
    fourcc(tag) ++ le32(body.length) ++ body ++ pad
  }

  private def riffList(subtype: String, body: Array[Byte]): Array[Byte] =
    riffChunk("LIST", fourcc(subtype) ++ body)

  /** BI_RGB DIB row stride: 3 bytes/pixel, each row padded to 4 bytes. */
  private def dibStride(width: Int): Int = (width * 3 + 3) & ~3

  /** Pack one grayscale frame (width·height bytes, top-down) into a real
    * uncompressed 24-bit BI_RGB DIB: BGR triples with B=G=R=gray, rows
    * stored BOTTOM-UP, each row padded to a 4-byte boundary — the exact
    * payload layout of an AVI '00db' chunk. */
  def encodeDib(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == width * height)
    val stride = dibStride(width)
    val out = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val row = (height - 1 - y) * stride // bottom-up
      var x = 0
      while (x < width) {
        val g = gray(y * width + x)
        out(row + x * 3) = g; out(row + x * 3 + 1) = g; out(row + x * 3 + 2) = g
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode one 24-bit BI_RGB bottom-up DIB payload back to top-down
    * grayscale pixels ((B+G+R)/3 per pixel — exact for the generator's
    * gray frames), or None when the payload doesn't match the stream
    * header's dimensions. */
  def decodeDib(width: Int, height: Int, dib: Array[Byte]): Option[Array[Byte]] = {
    val stride = dibStride(width)
    if (width <= 0 || height <= 0 || dib == null ||
      dib.length != stride * height) return None
    val out = new Array[Byte](width * height)
    var y = 0
    while (y < height) {
      val row = (height - 1 - y) * stride
      var x = 0
      while (x < width) {
        out(y * width + x) = (((dib(row + x * 3) & 0xFF) +
          (dib(row + x * 3 + 1) & 0xFF) + (dib(row + x * 3 + 2) & 0xFF)) / 3).toByte
        x += 1
      }
      y += 1
    }
    Some(out)
  }

  /** `strf.biCompression` value of an MJPG stream ('MJPG' as a
    * little-endian fourcc); BI_RGB uncompressed is 0. */
  val MjpgFourcc: Int = 0x47504A4D

  /** Encode one grayscale frame (width·height, top-down) as a baseline
    * JPEG via the JDK's public `javax.imageio` codec — the payload of an
    * MJPG AVI '00dc' chunk. Deterministic for a given input on a given
    * JDK (the writer embeds no timestamps). */
  def encodeJpeg(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == width * height)
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, width, height, gray)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** Decode one JPEG payload to top-down grayscale (band average when the
    * stream is not already single-band), or None on malformed bytes or a
    * dimension mismatch vs the stream header — the same total-function
    * contract as [[decodeDib]]. Lossy: pixels are close to, not equal to,
    * the encoder's input. */
  def decodeJpegGray(width: Int, height: Int, jpeg: Array[Byte]): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
      if (img == null || img.getWidth != width || img.getHeight != height) None
      else {
        val raster = img.getRaster
        val nb = raster.getNumBands
        val out = new Array[Byte](width * height)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            var s = 0; var b = 0
            while (b < nb) { s += raster.getSample(x, y, b); b += 1 }
            out(y * width + x) = (s / nb).toByte
            x += 1
          }
          y += 1
        }
        Some(out)
      }
    } catch { case _: Exception => None }

  /** Shared AVI container writer: genuine avih 56-byte main header plus a
    * strh/strf stream pair whose handler/compression describe the frame
    * codec; one word-aligned movi chunk per frame payload. */
  private def aviContainer(width: Int, height: Int, payloads: Array[Array[Byte]],
                           handler: String, biCompression: Int, sizeImage: Int,
                           chunkTag: String): Array[Byte] = {
    val maxFrame = if (payloads.isEmpty) 0 else payloads.map(_.length).max
    val avih = le32(33333) ++ le32(maxFrame * 30) ++ le32(0) ++ le32(0) ++
      le32(payloads.length) ++ le32(0) ++ le32(1) ++ le32(maxFrame) ++
      le32(width) ++ le32(height) ++ new Array[Byte](16)
    val strh = fourcc("vids") ++ fourcc(handler) ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(1) ++ le32(30) ++ le32(0) ++ le32(payloads.length) ++
      le32(maxFrame) ++ le32(-1) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(width) ++ le16(height) // rcFrame
    val strf = le32(40) ++ le32(width) ++ le32(height) ++ le16(1) ++ le16(24) ++
      le32(biCompression) ++ le32(sizeImage) ++ le32(0) ++
      le32(0) ++ le32(0) ++ le32(0)
    val hdrl = riffList("hdrl",
      riffChunk("avih", avih) ++
        riffList("strl", riffChunk("strh", strh) ++ riffChunk("strf", strf)))
    val movi = riffList("movi",
      payloads.flatMap(f => riffChunk(chunkTag, f)))
    val body = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ le32(body.length) ++ body
  }

  /** Minimal real AVI: one uncompressed-DIB 'vids' stream, one '00db'
    * chunk per frame. Headers are genuine (avih 56-byte main header,
    * strh/strf stream pair with biCompression = BI_RGB); `frames` are
    * GRAYSCALE PIXEL arrays (width·height each), packed to real DIB
    * payloads by [[encodeDib]]. */
  def encodeAvi(width: Int, height: Int, frames: Array[Array[Byte]]): Array[Byte] =
    aviContainer(width, height, frames.map(encodeDib(width, height, _)),
      "DIB ", 0 /* BI_RGB */, dibStride(width) * height, "00db")

  /** Motion-JPEG AVI: same genuine container, but each frame is a real
    * baseline JPEG in a '00dc' (compressed) chunk and the stream headers
    * declare the MJPG codec — the common compressed-AVI layout. */
  def encodeAviMjpg(width: Int, height: Int, frames: Array[Array[Byte]]): Array[Byte] = {
    val jpegs = frames.map(encodeJpeg(width, height, _))
    aviContainer(width, height, jpegs, "MJPG", MjpgFourcc,
      if (jpegs.isEmpty) 0 else jpegs.map(_.length).max, "00dc")
  }

  /** Real AVI demux: (width, height, frame chunks) or None if malformed.
    * Walks the RIFF tree, reads avih for dimensions/frame count, collects
    * the movi LIST's '..dc'/'..db' chunks, and cross-checks the header's
    * TotalFrames against the chunks actually present. Frame payloads are
    * the raw chunk bytes (DIBs or JPEGs per the stream header) — use
    * [[decodeAviPixels]] for the pixel-decoded form. */
  def decodeAvi(b: Array[Byte]): Option[(Int, Int, Array[Array[Byte]])] =
    demuxAvi(b).map { case (w, h, _, frames) => (w, h, frames) }

  /** Demux plus the strf.biCompression fourcc (0 = BI_RGB, [[MjpgFourcc]]
    * = MJPG) so the pixel decoder can pick the frame codec. */
  private def demuxAvi(b: Array[Byte]): Option[(Int, Int, Int, Array[Array[Byte]])] = {
    try {
      def tag(o: Int) = new String(b, o, 4, StandardCharsets.US_ASCII)
      def u16(o: Int) = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
      def u32(o: Int) = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
        ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
      if (b.length < 12 || tag(0) != "RIFF" || tag(8) != "AVI ") return None
      var w = -1; var h = -1; var totalFrames = -1; var comp = 0
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def walk(start: Int, end: Int): Unit = {
        var off = start
        while (off + 8 <= end) {
          val t = tag(off); val len = u32(off + 4)
          if (len < 0 || off + 8 + len > end) throw new RuntimeException("torn chunk")
          t match {
            case "LIST" => walk(off + 12, off + 8 + len) // subtype + body
            case "avih" =>
              if (len < 56) throw new RuntimeException("short avih")
              totalFrames = u32(off + 8 + 16)
              w = u32(off + 8 + 32); h = u32(off + 8 + 36)
            case "strf" => // BITMAPINFOHEADER: biCompression at byte 16
              if (len >= 20) comp = u32(off + 8 + 16)
            case dc if dc.length == 4 &&
              (dc.endsWith("dc") || dc.endsWith("db")) &&
              dc.take(2).forall(_.isDigit) =>
              frames += java.util.Arrays.copyOfRange(b, off + 8, off + 8 + len)
            case _ => ()
          }
          off += 8 + len + (len & 1) // chunks are word-aligned
        }
      }
      walk(12, 12 + math.min(u32(4) - 4, b.length - 12))
      if (w <= 0 || h <= 0 || frames.isEmpty || frames.length != totalFrames) None
      else Some((w, h, comp, frames.toArray))
    } catch { case _: Exception => None }
  }

  /** Demux + pixel-decode: (width, height, top-down grayscale frames).
    * The frame codec follows the stream header's biCompression — BI_RGB
    * chunks through [[decodeDib]], MJPG chunks through [[decodeJpegGray]];
    * an unknown codec, or any payload that fails against the header
    * dimensions, makes the whole file malformed (None). */
  def decodeAviPixels(b: Array[Byte]): Option[(Int, Int, Array[Array[Byte]])] =
    demuxAvi(b).flatMap { case (w, h, comp, chunks) =>
      val dec: Array[Byte] => Option[Array[Byte]] = comp match {
        case 0          => decodeDib(w, h, _)
        case MjpgFourcc => decodeJpegGray(w, h, _)
        case _          => _ => None
      }
      val px = chunks.map(dec)
      if (px.exists(_.isEmpty)) None else Some((w, h, px.map(_.get)))
    }

  // ---------------------------------------------------------------------
  // Synthetic corpus + decode dispatch
  // ---------------------------------------------------------------------

  private val kinds = Array("image", "audio", "video")

  /** Deterministic synthetic media corpus (pure function of (seed, id)):
    * REAL PNG bytes, REAL WAV bytes, REAL AVI container bytes. */
  def synthMedia(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[Media] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { i =>
      val h = graft.data.Synth.mix64(seed ^ graft.data.Synth.mix64(i))
      val kind = Math.floorMod(h, 3L).toInt
      def payload(len: Int): Array[Byte] = {
        val p = new Array[Byte](len)
        var s = h; var j = 0
        while (j < len) { s = graft.data.Synth.mix64(s); p(j) = (s & 0xFF).toByte; j += 1 }
        p
      }
      val blob = kind match {
        case 0 => // image: real PNG
          val w = 16 + Math.floorMod(h >>> 8, 48L).toInt
          val hgt = 16 + Math.floorMod(h >>> 16, 48L).toInt
          encodePng(w, hgt, payload(w * hgt))
        case 1 => // audio: real WAV
          val rate = 8000 * (1 + Math.floorMod(h >>> 8, 5L).toInt)
          val ch = 1 + Math.floorMod(h >>> 16, 2L).toInt
          encodeWav(rate, ch, payload(ch * (64 + Math.floorMod(h >>> 32, 192L).toInt)))
        case _ => // video: real AVI container, DIB or MJPG frame codec
          val w = 16 + Math.floorMod(h >>> 8, 64L).toInt
          val hgt = 16 + Math.floorMod(h >>> 16, 64L).toInt
          val nFrames = 1 + Math.floorMod(h >>> 24, 8L).toInt
          val fs = w * hgt // one grayscale frame
          val p = payload(nFrames * fs)
          val frames = Array.tabulate(nFrames)(f =>
            java.util.Arrays.copyOfRange(p, f * fs, (f + 1) * fs))
          // half the corpus per codec, so both decode paths run end-to-end
          if (((h >>> 40) & 1L) == 0L) encodeAvi(w, hgt, frames)
          else encodeAviMjpg(w, hgt, frames)
      }
      Media(i, kinds(kind), blob)
    })
  }

  /** Decode one blob to metadata (total function: malformed → valid=false). */
  def decodeOne(id: Long, kind: String, blob: Array[Byte]): MediaMeta = {
    val blobLen = if (blob == null) 0 else blob.length
    kind match {
      case "image" => decodePng(blob) match {
        case Some((w, h, px)) => MediaMeta(id, kind, w, h, 1, px.length, valid = true)
        case None => MediaMeta(id, kind, 0, 0, 0, blobLen, valid = false)
      }
      case "audio" => decodeWav(blob) match {
        case Some((rate, ch, samples)) =>
          MediaMeta(id, kind, rate, ch, samples.length / ch, samples.length, valid = true)
        case None => MediaMeta(id, kind, 0, 0, 0, blobLen, valid = false)
      }
      case _ => decodeAviPixels(blob) match {
        case Some((w, h, frames)) =>
          MediaMeta(id, kind, w, h, frames.length,
            frames.map(_.length).sum, valid = true)
        case None => MediaMeta(id, kind, 0, 0, 0, blobLen, valid = false)
      }
    }
  }

  /** Decoded payload (pixels / PCM samples / concatenated video frame
    * pixels), empty if malformed. */
  private def payloadOf(kind: String, blob: Array[Byte]): Array[Byte] = kind match {
    case "image" => decodePng(blob).map(_._3).getOrElse(Array.empty)
    case "audio" => decodeWav(blob).map(_._3).getOrElse(Array.empty)
    case _ => decodeAviPixels(blob).map(_._3.flatten).getOrElse(Array.empty)
  }

  /** One decode yielding BOTH the metadata row and the payload — the
    * fused form of ([[decodeOne]], [[payloadOf]]), which each run the
    * codec separately; field-for-field identical to both. */
  private def decodeMetaPayload(id: Long, kind: String,
                                blob: Array[Byte]): (MediaMeta, Array[Byte]) = {
    val blobLen = if (blob == null) 0 else blob.length
    def invalid = MediaMeta(id, kind, 0, 0, 0, blobLen, valid = false)
    kind match {
      case "image" => decodePng(blob) match {
        case Some((w, h, px)) =>
          (MediaMeta(id, kind, w, h, 1, px.length, valid = true), px)
        case None => (invalid, Array.empty[Byte])
      }
      case "audio" => decodeWav(blob) match {
        case Some((rate, ch, samples)) =>
          (MediaMeta(id, kind, rate, ch, samples.length / ch, samples.length,
            valid = true), samples)
        case None => (invalid, Array.empty[Byte])
      }
      case _ => decodeAviPixels(blob) match {
        case Some((w, h, frames)) =>
          (MediaMeta(id, kind, w, h, frames.length, frames.map(_.length).sum,
            valid = true), frames.flatten)
        case None => (invalid, Array.empty[Byte])
      }
    }
  }

  /** Batched decode: one pass per partition, decoder state reusable. */
  def decode(media: Dataset[Media]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (codec handle, buffers)
      it.map(m => decodeOne(m.media_id, m.kind, m.blob))
    }
  }

  /** Feature extraction over the DECODED payload: normalized 16-bin byte
    * histogram — the stand-in for an embedding/feature model, batch-shaped
    * like the real thing (fixed-width Array[Double] per row). */
  def features(media: Dataset[Media], bins: Int = 16): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val hist = new Array[Double](bins) // reused per partition, like a batch buffer
      it.map { m =>
        java.util.Arrays.fill(hist, 0.0)
        val payload = payloadOf(m.kind, m.blob)
        payload.foreach(b => hist(((b & 0xFF) * bins) / 256) += 1.0)
        val tot = math.max(payload.length, 1)
        MediaFeature(m.media_id, m.kind, hist.map(_ / tot))
      }
    }
  }

  /** Frame sampling: emit every `stride`-th frame — the flatMap (generator)
    * shape of video frame extraction. Images are 1-frame (the whole pixel
    * payload); video frames are the AVI's '00db' DIB chunks pixel-decoded
    * to grayscale; audio "frames" are per-channel planes, de-interleaved
    * from the PCM stream (sample i of channel c sits at index i·ch + c, as
    * encodeWav writes it). */
  def sampleFrames(media: Dataset[Media], stride: Int = 2): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      m.kind match {
        case "audio" =>
          val meta = decodeOne(m.media_id, m.kind, m.blob)
          val payload = payloadOf(m.kind, m.blob)
          val ch = meta.height
          if (!meta.valid || ch == 0 || payload.isEmpty) Iterator.empty
          else (0 until ch by stride).iterator.map { c =>
            val plane = new Array[Byte]((payload.length - c + ch - 1) / ch)
            var i = c; var j = 0
            while (i < payload.length) { plane(j) = payload(i); j += 1; i += ch }
            Frame(m.media_id, c, plane)
          }
        case "video" =>
          decodeAviPixels(m.blob) match {
            case Some((_, _, frames)) =>
              (0 until frames.length by stride).iterator
                .map(f => Frame(m.media_id, f, frames(f)))
            case None => Iterator.empty
          }
        case _ =>
          val payload = payloadOf(m.kind, m.blob)
          if (payload.isEmpty) Iterator.empty
          else Iterator.single(Frame(m.media_id, 0, payload))
      }
    }
  }

  /** Per-process parquet export of the per-media decode/feature rows — the
    * DuckDB oracle's input (the same export pattern as the q_pages_*
    * tokenized-pages parquet). PID-suffixed via [[graft.core.ExportRoot]]
    * so concurrent sessions on one machine cannot race on the directory;
    * `summary()` still overwrites it on every call WITHIN a process, which
    * is fine (last write wins, same rows — the export is deterministic).
    *
    * Because the DuckDB twin reads rows Spark wrote here, only the final
    * roll-up is independently verified — decode correctness rests on the
    * codec specs (PNG pixel parity vs javax.imageio, DIB/WAV round-trips),
    * by design. */
  val ExportDir = graft.core.ExportRoot.dir("media_export")

  /** Per-kind decode summary + mean feature mass (the q_multimodal query —
    * exercises decode + features + agg end-to-end). The per-media
    * intermediate (media_id, kind, width, height, valid, fsum) is written
    * to [[ExportDir]] first and the roll-up computed FROM the export: the
    * binary codec work stays spec-verified (pixel parity vs javax.imageio,
    * DIB/WAV round-trips), while the aggregation gets a driver-verified
    * DuckDB twin over the exported rows. */
  def summary(spark: SparkSession, n: Long = 2000, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    // ONE generate+decode pass: meta and the feature mass are both
    // functions of the decoded payload, so decoding once and deriving both
    // halves the generator/codec work and removes the meta⋈features
    // exchange outright. Byte-identical to the two-pass form (parity-
    // tested in MultimodalSpec): same decoders, histogram accumulated per
    // payload byte, fsum summed in ascending bin order — the order the
    // explode fed the old aggregate — and rounded with the same HALF_UP
    // BigDecimal arithmetic Spark's round uses.
    val bins = 16
    synthMedia(spark, n, seed).mapPartitions { it =>
      val hist = new Array[Double](bins)
      it.map { m =>
        val (meta, payload) = decodeMetaPayload(m.media_id, m.kind, m.blob)
        java.util.Arrays.fill(hist, 0.0)
        var i = 0
        while (i < payload.length) {
          hist(((payload(i) & 0xFF) * bins) / 256) += 1.0
          i += 1
        }
        val tot = math.max(payload.length, 1)
        var s = 0.0
        var b = 0
        while (b < bins) { s += hist(b) / tot; b += 1 }
        val fsum = java.math.BigDecimal.valueOf(s)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        (m.media_id, m.kind, meta.width, meta.height, meta.valid, fsum)
      }
    }.toDF("media_id", "kind", "width", "height", "valid", "fsum")
      // repartition(1), NOT coalesce(1): with the join exchange gone the
      // plan is all-narrow, and coalesce would collapse the whole
      // generate+decode chain into one task — the tiny row exchange keeps
      // the codec work parallel while still writing a single file
      .repartition(1).write.mode("overwrite").parquet(ExportDir)
    spark.read.parquet(ExportDir)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("valid"), 1).otherwise(0)).as("n_valid"),
        round(avg(col("width")), 6).as("avg_w"),
        round(avg(col("height")), 6).as("avg_h"),
        round(avg(col("fsum")), 6).as("avg_fsum"))
  }
}
