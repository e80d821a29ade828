package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * with decode/feature-extraction run as typed partition-wise functions.
  *
  * Real image/audio/video codecs are not available in this environment, so
  * the DECODE STEP IS A STUB — [[FakeDecoder]] derives deterministic
  * pseudo-features from the bytes. Everything around it is the real
  * production shape: a `struct(content BINARY, mime STRING, meta MAP)`
  * payload column, partition-batched decoding through `mapPartitions`
  * (one decoder instance per partition, the pattern a JNI/FFmpeg/libvips
  * binding needs), and explode-based frame sampling. Swap [[FakeDecoder]]
  * for a real codec and nothing else changes.
  */
object MultimodalOps {

  /** Typed decoded-media record (the decoder's batch output shape). */
  final case class MediaFeatures(doc_id: Long, nbytes: Int, width: Int,
                                 height: Int, frames: Int)

  /** Decoder contract: bytes → features. One instance per partition. */
  trait Decoder extends Serializable {
    def decode(id: Long, bytes: Array[Byte]): MediaFeatures
  }

  /** Deterministic stand-in for a real codec (???-equivalent, but runnable
    * and testable): features are pure functions of the byte length. Still
    * the fallback for byte streams [[ImageCodec.parse]] cannot identify,
    * and the stand-in for formats (audio/video codecs) that genuinely
    * need native libraries this sandbox lacks. */
  object FakeDecoder extends Decoder {
    def decode(id: Long, bytes: Array[Byte]): MediaFeatures = {
      val n = bytes.length
      MediaFeatures(id, n, 1 + n % 640, 1 + (n * 7) % 480, 1 + n % 30)
    }
  }

  /** REAL image-container codec, pure JVM, zero dependencies: writes and
    * header-parses minimal-but-valid PNG / GIF89a / baseline-JPEG
    * containers. The parser is the production-shaped piece — it walks the
    * actual binary structure (PNG chunk framing with CRC32 verification
    * of IHDR, GIF logical-screen descriptor + extension/image-descriptor
    * blocks, JPEG marker segments to SOF) and never looks at anything but
    * the bytes. The writer exists so fixtures can carry genuine binary
    * containers for the parser to decode (payload rides in IDAT / comment
    * sub-blocks / COM segments). PNG frame count is 1 (APNG acTL not
    * emitted); GIF frames = image-descriptor count — the animation
    * format. */
  object ImageCodec {
    final case class Parsed(fmt: String, width: Int, height: Int,
                            frames: Int, payloadBytes: Int)

    private def be16(v: Int): Array[Byte] =
      Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    private def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    private def le16(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
    private def rdBe16(b: Array[Byte], i: Int): Int =
      (u8(b, i) << 8) | u8(b, i + 1)
    private def rdBe32(b: Array[Byte], i: Int): Long =
      (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
        (u8(b, i + 2) << 8) | u8(b, i + 3)
    private def rdLe16(b: Array[Byte], i: Int): Int =
      u8(b, i) | (u8(b, i + 1) << 8)
    private def le32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    private def rdLe32(b: Array[Byte], i: Int): Long =
      u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
        (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

    private val pngSig =
      Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

    private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(t); crc.update(data)
      be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
    }

    /** Valid PNG: signature, IHDR (8-bit RGB, real CRC32), one IDAT
      * carrying `payload`, IEND. */
    def encodePng(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
      val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)
      pngSig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", payload) ++
        pngChunk("IEND", Array.emptyByteArray)
    }

    /** Valid GIF89a: logical-screen descriptor (LE dims), `payload` in a
      * comment extension's ≤255-byte sub-blocks, `frames` minimal image
      * descriptors, trailer. */
    def encodeGif(w: Int, h: Int, frames: Int,
                  payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(payload.length + 64)
      out.write("GIF89a".getBytes("US-ASCII"))
      out.write(le16(w)); out.write(le16(h))
      out.write(0); out.write(0); out.write(0) // no GCT, bg, aspect
      out.write(0x21); out.write(0xFE)         // comment extension
      payload.grouped(255).foreach { g => out.write(g.length); out.write(g) }
      out.write(0)                             // sub-block terminator
      var i = 0
      while (i < frames) {                     // minimal image descriptors
        out.write(0x2C)
        out.write(le16(0)); out.write(le16(0))
        out.write(le16(w)); out.write(le16(h))
        out.write(0)                           // no local color table
        out.write(2)                           // LZW min code size
        out.write(0)                           // empty data chain
        i += 1
      }
      out.write(0x3B)                          // trailer
      out.toByteArray
    }

    /** Valid baseline JPEG: SOI, `payload` in ≤65533-byte COM segments,
      * SOF0 (BE height/width, 3 components), EOI. */
    def encodeJpeg(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(payload.length + 64)
      out.write(0xFF); out.write(0xD8)         // SOI
      payload.grouped(65533).foreach { g =>
        out.write(0xFF); out.write(0xFE)       // COM
        out.write(be16(g.length + 2)); out.write(g)
      }
      out.write(0xFF); out.write(0xC0)         // SOF0
      out.write(be16(17)); out.write(8)        // len, precision
      out.write(be16(h)); out.write(be16(w)); out.write(3)
      var c = 1
      while (c <= 3) { out.write(c); out.write(0x11); out.write(0); c += 1 }
      out.write(0xFF); out.write(0xD9)         // EOI
      out.toByteArray
    }

    /** Sniff the magic and header-parse dims / frame count / carried
      * payload bytes. None for unidentifiable or structurally broken
      * streams (including a PNG whose IHDR CRC does not check out). */
    def parse(bytes: Array[Byte]): Option[Parsed] =
      try {
        if (bytes.length >= 8 && bytes.take(8).sameElements(pngSig))
          parsePng(bytes)
        else if (bytes.length >= 13 && (bytes.take(6).sameElements(
            "GIF89a".getBytes("US-ASCII")) || bytes.take(6).sameElements(
            "GIF87a".getBytes("US-ASCII"))))
          parseGif(bytes)
        else if (bytes.length >= 4 && u8(bytes, 0) == 0xFF &&
            u8(bytes, 1) == 0xD8)
          parseJpeg(bytes)
        else if (bytes.length >= 54 && u8(bytes, 0) == 'B'.toInt &&
            u8(bytes, 1) == 'M'.toInt)
          parseBmp(bytes)
        else if (bytes.length >= 8 &&
            ((u8(bytes, 0) == 'I'.toInt && u8(bytes, 1) == 'I'.toInt) ||
             (u8(bytes, 0) == 'M'.toInt && u8(bytes, 1) == 'M'.toInt)))
          parseTiff(bytes)
        else if (bytes.length >= 12 && bytes.take(4).sameElements(
            "RIFF".getBytes("US-ASCII")) && bytes.slice(8, 12).sameElements(
            "WEBP".getBytes("US-ASCII"))) // WAVE form falls to AudioCodec
          parseWebp(bytes)
        else None
      } catch { case _: IndexOutOfBoundsException => None }

    private def le24(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte)
    private def rdLe24(b: Array[Byte], i: Int): Int =
      u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)

    private def riffChunk(fourcc: String, data: Array[Byte]): Array[Byte] = {
      val pad = if ((data.length & 1) == 1) Array[Byte](0)
        else Array.emptyByteArray
      fourcc.getBytes("US-ASCII") ++ le32(data.length) ++ data ++ pad
    }

    /** Valid extended WebP: RIFF/WEBP form, VP8X chunk carrying the
      * 24-bit canvas dims (stored as dim−1 per spec), `payload` riding
      * in an XMP metadata chunk (a standard VP8X-signalled chunk that
      * tolerates arbitrary bytes; odd sizes pad per RIFF). ref: the
      * RIFF container + VP8X wire layout is public WebP documentation. */
    def encodeWebp(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
      require(w >= 1 && h >= 1 && w <= (1 << 24) && h <= (1 << 24),
        s"webp canvas out of 24-bit range: ${w}x$h")
      val vp8x = Array[Byte](0x04, 0, 0, 0) ++ // XMP flag, 3 reserved
        le24(w - 1) ++ le24(h - 1)
      val body = "WEBP".getBytes("US-ASCII") ++
        riffChunk("VP8X", vp8x) ++ riffChunk("XMP ", payload)
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }

    /** WebP RIFF walk: verify the declared RIFF size, then step the
      * even-aligned chunk chain — VP8X yields the canvas dims (+1 per
      * spec), the XMP chunk's declared size is the carried payload. */
    private def parseWebp(b: Array[Byte]): Option[Parsed] = {
      if (rdLe32(b, 4) != (b.length - 8).toLong) return None
      var pos = 12
      var w = -1; var h = -1; var payload = -1
      while (pos + 8 <= b.length) {
        val cc = new String(b.slice(pos, pos + 4), "US-ASCII")
        val len = rdLe32(b, pos + 4).toInt
        if (len < 0 || pos + 8 + len > b.length) return None
        if (cc == "VP8X" && len >= 10) {
          w = rdLe24(b, pos + 12) + 1
          h = rdLe24(b, pos + 15) + 1
        }
        if (cc == "XMP ") payload = len
        pos += 8 + len + (len & 1)
      }
      if (w <= 0 || h <= 0) return None
      Some(Parsed("webp", w, h, 1, math.max(payload, 0)))
    }

    /** Minimal canonical TIFF (little-endian "II"): 8-byte header, one
      * IFD with ImageWidth(256)/ImageLength(257) LONG entries, payload
      * after the IFD terminator. ref: the TIFF 6.0 header/IFD wire
      * layout is public Adobe documentation. */
    def encodeTiff(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
      "II".getBytes("US-ASCII") ++ le16(42) ++ le32(8) ++ // IFD at 8
        le16(2) ++                                        // 2 entries
        le16(256) ++ le16(4) ++ le32(1) ++ le32(w) ++     // ImageWidth
        le16(257) ++ le16(4) ++ le32(1) ++ le32(h) ++     // ImageLength
        le32(0) ++                                        // no next IFD
        payload
    }

    /** TIFF header walk, BOTH byte orders: verify magic 42, follow the
      * first-IFD offset, scan its 12-byte entries for the dim tags
      * (SHORT or LONG, inline values per spec); payload = everything
      * past the IFD terminator. */
    private def parseTiff(b: Array[Byte]): Option[Parsed] = {
      val le = u8(b, 0) == 'I'.toInt
      def r16(i: Int): Int = if (le) rdLe16(b, i) else rdBe16(b, i)
      def r32(i: Int): Long = if (le) rdLe32(b, i) else rdBe32(b, i)
      if (r16(2) != 42) return None
      val ifd = r32(4)
      if (ifd < 8L || ifd + 2 > b.length) return None
      val cnt = r16(ifd.toInt)
      val entriesEnd = ifd.toInt + 2 + cnt * 12
      if (entriesEnd + 4 > b.length) return None
      var w = -1; var h = -1
      var e = ifd.toInt + 2
      while (e < entriesEnd) {
        val tag = r16(e); val typ = r16(e + 2)
        // SHORT inline values sit in the FIRST two value bytes (both
        // byte orders); LONG uses all four
        val v =
          if (typ == 3) r16(e + 8)
          else if (typ == 4) r32(e + 8).toInt
          else -1
        if (tag == 256) w = v
        if (tag == 257) h = v
        e += 12
      }
      if (w <= 0 || h <= 0) return None
      Some(Parsed("tiff", w, h, 1, b.length - (entriesEnd + 4)))
    }

    /** Canonical Windows BMP: 14-byte BITMAPFILEHEADER + 40-byte
      * BITMAPINFOHEADER (24bpp, uncompressed), payload rides after the
      * pixel-data offset exactly like the PNG IDAT stash.
      * ref: the BITMAPFILEHEADER/BITMAPINFOHEADER wire layout is public
      * Windows GDI documentation. */
    def encodeBmp(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
      val fileSize = 54 + payload.length
      "BM".getBytes("US-ASCII") ++ le32(fileSize) ++ le32(0) ++
        le32(54) ++ // pixel-data offset
        le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
        le32(0) ++ le32(payload.length) ++ le32(2835) ++ le32(2835) ++
        le32(0) ++ le32(0) ++
        payload
    }

    /** BMP header walk: signature + declared file size, DIB header size,
      * plane count sanity, dims at the documented LE offsets; payload =
      * declared file size − pixel-data offset. Top-down bitmaps carry a
      * NEGATIVE height — report magnitude. */
    private def parseBmp(b: Array[Byte]): Option[Parsed] = {
      if (rdLe32(b, 2) != b.length.toLong) return None
      val dataOff = rdLe32(b, 10)
      if (rdLe32(b, 14) < 40L) return None // pre-BITMAPINFOHEADER DIBs
      if (rdLe16(b, 26) != 1) return None  // plane count is always 1
      val w = rdLe32(b, 18).toInt
      val h = math.abs(rdLe32(b, 22).toInt)
      if (w <= 0 || h <= 0 || dataOff < 54L || dataOff > b.length)
        return None
      Some(Parsed("bmp", w, h, 1, (b.length - dataOff).toInt))
    }

    private def parsePng(b: Array[Byte]): Option[Parsed] = {
      var pos = 8
      var w = -1; var h = -1; var idat = 0L
      while (pos + 8 <= b.length) {
        val len = rdBe32(b, pos)
        if (len > Int.MaxValue - 12 || pos + 12 + len > b.length) return None
        val typ = new String(b, pos + 4, 4, "US-ASCII")
        typ match {
          case "IHDR" =>
            val crc = new java.util.zip.CRC32
            crc.update(b, pos + 4, 4 + len.toInt)
            if ((crc.getValue & 0xFFFFFFFFL) !=
              rdBe32(b, pos + 8 + len.toInt)) return None
            w = rdBe32(b, pos + 8).toInt; h = rdBe32(b, pos + 12).toInt
          case "IDAT" => idat += len
          case "IEND" =>
            return if (w > 0 && h > 0)
              Some(Parsed("png", w, h, 1, idat.toInt)) else None
          case _ => ()
        }
        pos += 12 + len.toInt
      }
      None
    }

    private def parseGif(b: Array[Byte]): Option[Parsed] = {
      val w = rdLe16(b, 6); val h = rdLe16(b, 8)
      val packed = u8(b, 10)
      var pos = 13
      if ((packed & 0x80) != 0) pos += 3 * (1 << ((packed & 7) + 1))
      var frames = 0; var comment = 0
      def skipSubBlocks(count: Boolean): Unit = {
        var n = u8(b, pos); pos += 1
        while (n != 0) {
          if (count) comment += n
          pos += n; n = u8(b, pos); pos += 1
        }
      }
      while (pos < b.length) {
        u8(b, pos) match {
          case 0x21 => // extension: label, then sub-blocks
            val label = u8(b, pos + 1); pos += 2
            skipSubBlocks(count = label == 0xFE)
          case 0x2C => // image descriptor
            frames += 1
            val p = u8(b, pos + 9); pos += 10
            if ((p & 0x80) != 0) pos += 3 * (1 << ((p & 7) + 1))
            pos += 1 // LZW min code size
            skipSubBlocks(count = false)
          case 0x3B =>
            return if (w > 0 && h > 0)
              Some(Parsed("gif", w, h, math.max(frames, 1), comment))
            else None
          case _ => return None
        }
      }
      None
    }

    private def parseJpeg(b: Array[Byte]): Option[Parsed] = {
      var pos = 2
      var w = -1; var h = -1; var com = 0
      val sof = Set(0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
      while (pos + 2 <= b.length) {
        if (u8(b, pos) != 0xFF) return None
        val marker = u8(b, pos + 1)
        if (marker == 0xD9) // EOI
          return if (w > 0 && h > 0) Some(Parsed("jpeg", w, h, 1, com))
          else None
        if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) pos += 2
        else {
          if (pos + 4 > b.length) return None
          val len = rdBe16(b, pos + 2)
          if (len < 2 || pos + 2 + len > b.length) return None
          if (sof(marker)) { h = rdBe16(b, pos + 5); w = rdBe16(b, pos + 7) }
          if (marker == 0xFE) com += len - 2
          if (marker == 0xDA) // SOS: entropy data follows, stop walking
            return if (w > 0 && h > 0) Some(Parsed("jpeg", w, h, 1, com))
            else None
          pos += 2 + len
        }
      }
      None
    }
  }

  /** REAL audio-container codec, pure JVM, zero dependencies — the
    * [[ImageCodec]] approach extended to sound: writes and header-parses
    * canonical RIFF/WAVE (PCM) containers. The parser walks the actual
    * chunk framing — RIFF signature + WAVE form type, then the
    * even-padded chunk chain to `fmt ` (audio format, channels, sample
    * rate, block align, bits per sample — all little-endian) and `data`
    * (offset + byte length) — so sample rates and durations downstream
    * are genuinely decoded, not length-derived. The writer exists so
    * fixtures can carry valid WAV bytes for the parser to decode (PCM
    * payload rides in the data chunk). */
  object AudioCodec {
    /** Parsed WAV header: everything `fmt ` + `data` declare. */
    final case class WavParsed(sampleRate: Int, channels: Int, bits: Int,
                               blockAlign: Int, dataOffset: Int,
                               dataBytes: Int)

    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
    private def rdLe16(b: Array[Byte], i: Int): Int =
      u8(b, i) | (u8(b, i + 1) << 8)
    private def rdLe32(b: Array[Byte], i: Int): Long =
      u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
        (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
    private def le16(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    private def le32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

    /** Valid PCM WAV: RIFF header, 16-byte fmt chunk, one data chunk
      * carrying `payload` as the sample stream (odd lengths get the
      * spec's pad byte, excluded from the declared data size). */
    def encodeWav(sampleRate: Int, channels: Int, bits: Int,
                  payload: Array[Byte]): Array[Byte] = {
      val blockAlign = channels * bits / 8
      val pad = payload.length & 1
      val out = new java.io.ByteArrayOutputStream(payload.length + 44 + pad)
      out.write("RIFF".getBytes("US-ASCII"))
      out.write(le32(4 + 24 + 8 + payload.length + pad))
      out.write("WAVE".getBytes("US-ASCII"))
      out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
      out.write(le16(1))                       // PCM
      out.write(le16(channels))
      out.write(le32(sampleRate))
      out.write(le32(sampleRate * blockAlign)) // byte rate
      out.write(le16(blockAlign))
      out.write(le16(bits))
      out.write("data".getBytes("US-ASCII"))
      out.write(le32(payload.length))
      out.write(payload)
      if (pad == 1) out.write(0)               // chunk padding to even
      out.toByteArray
    }

    /** Sniff RIFF/WAVE and walk the chunk chain to fmt + data. None for
      * unidentifiable or structurally broken streams (truncated chunks,
      * missing fmt/data, non-positive rates). */
    def parse(bytes: Array[Byte]): Option[WavParsed] =
      try {
        if (bytes.length < 12 ||
          !new String(bytes, 0, 4, "US-ASCII").equals("RIFF") ||
          !new String(bytes, 8, 4, "US-ASCII").equals("WAVE")) return None
        var pos = 12
        var sr = -1; var ch = -1; var bits = -1; var ba = -1
        var dOff = -1; var dLen = -1
        while (pos + 8 <= bytes.length) {
          val id = new String(bytes, pos, 4, "US-ASCII")
          val len = rdLe32(bytes, pos + 4)
          if (len > bytes.length - pos - 8) return None
          id match {
            case "fmt " =>
              if (len < 16) return None
              ch = rdLe16(bytes, pos + 10)
              sr = rdLe32(bytes, pos + 12).toInt
              ba = rdLe16(bytes, pos + 20)
              bits = rdLe16(bytes, pos + 22)
            case "data" => dOff = pos + 8; dLen = len.toInt
            case _      => ()
          }
          pos += 8 + len.toInt + (len.toInt & 1) // chunks pad to even
        }
        if (sr > 0 && ch > 0 && bits > 0 && ba > 0 && dOff >= 0)
          Some(WavParsed(sr, ch, bits, ba, dOff, dLen))
        else None
      } catch { case _: IndexOutOfBoundsException => None }
  }

  /** REAL FLAC-container codec, pure JVM, zero dependencies — the first
    * BIT-PACKED header in the family (every other container aligns
    * fields on byte boundaries): STREAMINFO packs sample rate (20 bits),
    * channels−1 (3), bits-per-sample−1 (5) and total samples (36) into
    * one big-endian 64-bit field. The parser walks the metadata-block
    * chain (1-byte last-flag+type header, 24-bit BE length) to
    * STREAMINFO and extracts the fields by shift/mask; payload rides a
    * spec-legal APPLICATION block ("grft" id). ref: the FLAC
    * metadata-block wire layout is public Xiph documentation. */
  object FlacCodec {
    final case class FlacParsed(sampleRate: Int, channels: Int, bits: Int,
                                totalSamples: Long, dataBytes: Int)

    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
    private def be24(v: Int): Array[Byte] =
      Array(((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        (v & 0xFF).toByte)
    private def rdBe24(b: Array[Byte], i: Int): Int =
      (u8(b, i) << 16) | (u8(b, i + 1) << 8) | u8(b, i + 2)
    private def be16(v: Int): Array[Byte] =
      Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

    /** Valid FLAC: fLaC magic, STREAMINFO metadata block (34 bytes, the
      * packed 64-bit field genuinely bit-assembled), then one LAST
      * APPLICATION block ("grft") carrying `payload`. */
    def encodeFlac(sampleRate: Int, channels: Int, bits: Int,
                   totalSamples: Long, payload: Array[Byte]): Array[Byte] = {
      require(sampleRate >= 1 && sampleRate < (1 << 20),
        s"sample rate $sampleRate outside FLAC's 20 bits")
      require(channels >= 1 && channels <= 8, s"channels $channels")
      require(bits >= 1 && bits <= 32, s"bits $bits")
      require(totalSamples >= 0 && totalSamples < (1L << 36),
        s"total samples $totalSamples outside 36 bits")
      val packed = (sampleRate.toLong << 44) |
        ((channels - 1).toLong << 41) | ((bits - 1).toLong << 36) |
        totalSamples
      val out = new java.io.ByteArrayOutputStream(payload.length + 64)
      out.write("fLaC".getBytes("US-ASCII"))
      out.write(0x00); out.write(be24(34))     // STREAMINFO, not last
      out.write(be16(4096)); out.write(be16(4096)) // min/max block size
      out.write(be24(0)); out.write(be24(0))   // min/max frame size
      var i = 7
      while (i >= 0) { out.write(((packed >>> (i * 8)) & 0xFF).toInt); i -= 1 }
      out.write(Array.fill[Byte](16)(0))       // unset MD5
      out.write(0x80 | 0x02)                   // APPLICATION, last
      out.write(be24(4 + payload.length))
      out.write("grft".getBytes("US-ASCII"))
      out.write(payload)
      out.toByteArray
    }

    /** fLaC metadata-block walk: STREAMINFO's packed field comes apart
      * by shift/mask; dataBytes = the APPLICATION payload past its
      * 4-byte id. None on truncation, a missing STREAMINFO, or fields
      * outside their bit ranges. */
    def parse(b: Array[Byte]): Option[FlacParsed] =
      try {
        if (b.length < 8 ||
          !new String(b, 0, 4, "US-ASCII").equals("fLaC")) return None
        var pos = 4
        var info: Option[(Int, Int, Int, Long)] = None
        var data = 0
        var last = false
        while (!last && pos + 4 <= b.length) {
          val hdr = u8(b, pos)
          last = (hdr & 0x80) != 0
          val typ = hdr & 0x7F
          val len = rdBe24(b, pos + 1)
          if (pos + 4 + len > b.length) return None
          if (typ == 0 && len >= 34) {
            var packed = 0L
            var i = 0
            while (i < 8) { packed = (packed << 8) | u8(b, pos + 14 + i); i += 1 }
            val sr = (packed >>> 44).toInt
            val ch = ((packed >>> 41) & 0x7).toInt + 1
            val bps = ((packed >>> 36) & 0x1F).toInt + 1
            val ns = packed & 0xFFFFFFFFFL
            if (sr <= 0) return None
            info = Some((sr, ch, bps, ns))
          }
          if (typ == 2 && len >= 4) data += len - 4
          pos += 4 + len
        }
        info.map { case (sr, ch, bps, ns) =>
          FlacParsed(sr, ch, bps, ns, data) }
      } catch { case _: IndexOutOfBoundsException => None }
  }

  /** Typed FLAC metadata record from the real bit-packed parse;
    * durations derive from the DECLARED total samples (floored long
    * arithmetic, engine-portable). */
  final case class FlacMeta(doc_id: Long, fmt: String, sample_rate: Int,
                            channels: Int, bits: Int, n_samples: Long,
                            data_bytes: Int, duration_ms: Long)

  /** FLAC-encode input row. */
  final case class FlacSpec(doc_id: Long, sample_rate: Int, channels: Int,
                            bits: Int, n_samples: Long, payload: Array[Byte])

  /** Encode rows into REAL FLAC containers, partition-wise. */
  def encodeFlacs(specs: DataFrame): DataFrame = {
    implicit val inEnc: Encoder[FlacSpec] = Encoders.product[FlacSpec]
    implicit val outEnc: Encoder[(Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    specs
      .select(col("doc_id").cast("long"), col("sample_rate").cast("int"),
        col("channels").cast("int"), col("bits").cast("int"),
        col("n_samples").cast("long"), col("payload"))
      .as[FlacSpec]
      .mapPartitions(_.map { sp =>
        (sp.doc_id, FlacCodec.encodeFlac(sp.sample_rate, sp.channels,
          sp.bits, sp.n_samples, sp.payload))
      })
      .toDF("doc_id", "content")
      .select(col("doc_id"), struct(col("content"),
        lit("audio/flac").as("mime"),
        map(lit("codec"), lit("audio/flac")).as("meta")).as("payload"))
  }

  /** Decode payloads to typed FLAC metadata via the real bit-packed
    * parser; unidentifiable bytes degrade to fmt='unknown'. */
  def decodeFlacMeta(packed: DataFrame, idCol: String): Dataset[FlacMeta] = {
    implicit val enc: Encoder[FlacMeta] = Encoders.product[FlacMeta]
    implicit val inEnc: Encoder[(Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    packed.select(col(idCol).cast("long"), col("payload.content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        FlacCodec.parse(bytes) match {
          case Some(p) =>
            FlacMeta(id, "flac", p.sampleRate, p.channels, p.bits,
              p.totalSamples, p.dataBytes,
              p.totalSamples * 1000L / p.sampleRate)
          case None =>
            FlacMeta(id, "unknown", 0, 0, 0, 0L, bytes.length, 0L)
        }
      })
  }

  /** REAL video-container codec, pure JVM, zero dependencies — the third
    * modality's header walk: writes and parses minimal-but-valid ISO
    * BMFF (MP4) files. The parser walks the actual box structure —
    * big-endian (size, 4CC) top-level chain to `moov`, its children to
    * `mvhd` (version 0 and 1 layouts: timescale + duration), and sums
    * `mdat` payload bytes — so durations downstream come from genuinely
    * decoded movie headers. 64-bit largesize boxes are handled;
    * truncated or non-BMFF bytes parse to None. (Track/codec boxes are
    * out of scope — the movie header carries what a corpus manifest
    * needs; frame DECODE stays the documented native-codec stub.) */
  object VideoCodec {
    /** Parsed MP4 movie header + payload size. */
    final case class Mp4Parsed(timescale: Long, durationTicks: Long,
                               mdatBytes: Int)

    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
    private def rdBe32(b: Array[Byte], i: Int): Long =
      (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
        (u8(b, i + 2) << 8) | u8(b, i + 3)
    private def rdBe64(b: Array[Byte], i: Int): Long =
      (rdBe32(b, i) << 32) | rdBe32(b, i + 4)
    private def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    private def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8L) ++ typ.getBytes("US-ASCII") ++ body

    /** Valid minimal MP4: ftyp(isom), moov(mvhd v0 with the given
      * timescale/duration), mdat carrying `payload`. */
    def encodeMp4(timescale: Long, durationTicks: Long,
                  payload: Array[Byte]): Array[Byte] = {
      val ftyp = box("ftyp",
        "isom".getBytes("US-ASCII") ++ be32(0) ++
          "isom".getBytes("US-ASCII"))
      val mvhd = box("mvhd",
        Array[Byte](0, 0, 0, 0) ++        // version 0 + flags
          be32(0) ++ be32(0) ++            // creation/modification time
          be32(timescale) ++ be32(durationTicks) ++
          be32(0x00010000L) ++             // rate 1.0
          Array[Byte](1, 0, 0, 0) ++       // volume 1.0 + reserved
          new Array[Byte](8) ++            // reserved
          (be32(0x00010000L) ++ be32(0) ++ be32(0) ++
            be32(0) ++ be32(0x00010000L) ++ be32(0) ++
            be32(0) ++ be32(0) ++ be32(0x40000000L)) ++ // unity matrix
          new Array[Byte](24) ++           // pre_defined
          be32(2))                         // next_track_ID
      ftyp ++ box("moov", mvhd) ++ box("mdat", payload)
    }

    /** Walk the box chain; None for unidentifiable/truncated streams
      * (the first top-level box must be a well-formed known BMFF box). */
    def parse(bytes: Array[Byte]): Option[Mp4Parsed] =
      try {
        if (bytes.length < 16) return None
        // sniff: a plausible first box with a known brand-bearing type
        val t0 = new String(bytes, 4, 4, "US-ASCII")
        if (!Set("ftyp", "moov", "mdat", "free", "styp")(t0)) return None
        var pos = 0L
        var ts = -1L; var dur = -1L; var mdat = 0L
        def walkMvhd(off: Int): Unit = {
          val version = u8(bytes, off)
          if (version == 1) {
            ts = rdBe32(bytes, off + 20); dur = rdBe64(bytes, off + 24)
          } else {
            ts = rdBe32(bytes, off + 12); dur = rdBe32(bytes, off + 16)
          }
        }
        def walkChildren(start: Long, end: Long): Unit = {
          var p = start
          while (p + 8 <= end) {
            val sz0 = rdBe32(bytes, p.toInt)
            val typ = new String(bytes, p.toInt + 4, 4, "US-ASCII")
            val (sz, hdr) =
              if (sz0 == 1L && p + 16 <= end)
                (rdBe64(bytes, p.toInt + 8), 16L)
              else (sz0, 8L)
            if (sz < hdr || p + sz > end) return
            if (typ == "mvhd") walkMvhd((p + hdr).toInt)
            p += sz
          }
        }
        while (pos + 8 <= bytes.length) {
          val sz0 = rdBe32(bytes, pos.toInt)
          val typ = new String(bytes, pos.toInt + 4, 4, "US-ASCII")
          val (sz, hdr) =
            if (sz0 == 1L && pos + 16 <= bytes.length)
              (rdBe64(bytes, pos.toInt + 8), 16L)
            else if (sz0 == 0L) (bytes.length - pos, 8L) // box-to-end
            else (sz0, 8L)
          if (sz < hdr || pos + sz > bytes.length) return None
          typ match {
            case "moov" => walkChildren(pos + hdr, pos + sz)
            case "mdat" => mdat += sz - hdr
            case _      => ()
          }
          pos += sz
        }
        if (ts > 0 && dur >= 0) Some(Mp4Parsed(ts, dur, mdat.toInt))
        else None
      } catch { case _: IndexOutOfBoundsException => None }
  }

  /** Typed video-metadata record from a real movie-header parse;
    * duration_ms = ticks·1000/timescale in floored long arithmetic. */
  final case class VideoMeta(doc_id: Long, fmt: String, timescale: Long,
                             duration_ticks: Long, duration_ms: Long,
                             data_bytes: Int)

  /** MP4-encode input row: one payload to containerize. */
  final case class Mp4Spec(doc_id: Long, timescale: Long,
                           duration_ticks: Long, payload: Array[Byte])

  /** Encode rows into REAL MP4 containers, partition-wise (the video
    * sibling of [[encodeImages]]/[[encodeWavs]]). */
  def encodeMp4s(specs: DataFrame): DataFrame = {
    implicit val inEnc: Encoder[Mp4Spec] = Encoders.product[Mp4Spec]
    implicit val outEnc: Encoder[(Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    specs
      .select(col("doc_id").cast("long"), col("timescale").cast("long"),
        col("duration_ticks").cast("long"), col("payload"))
      .as[Mp4Spec]
      .mapPartitions(_.map { sp =>
        (sp.doc_id, VideoCodec.encodeMp4(sp.timescale, sp.duration_ticks,
          sp.payload))
      })
      .toDF("doc_id", "content")
      .select(col("doc_id"), struct(col("content"),
        lit("video/mp4").as("mime"),
        map(lit("codec"), lit("video/mp4")).as("meta")).as("payload"))
  }

  /** Decode payloads to typed video metadata via the real box walker;
    * unidentifiable bytes degrade to fmt='unknown' with zeroed fields
    * and the raw byte length as data_bytes. */
  def decodeVideoMeta(packed: DataFrame, idCol: String): Dataset[VideoMeta] = {
    implicit val enc: Encoder[VideoMeta] = Encoders.product[VideoMeta]
    implicit val inEnc: Encoder[(Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    packed.select(col(idCol).cast("long"), col("payload.content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        VideoCodec.parse(bytes) match {
          case Some(p) =>
            VideoMeta(id, "mp4", p.timescale, p.durationTicks,
              p.durationTicks * 1000L / p.timescale, p.mdatBytes)
          case None =>
            VideoMeta(id, "unknown", 0L, 0L, 0L, bytes.length)
        }
      })
  }

  /** Real header decode with graceful degradation: identifiable image
    * containers get genuinely parsed geometry (width/height from the
    * header, frames from GIF image descriptors, nbytes = payload bytes
    * the container carries); unknown formats fall back to
    * [[FakeDecoder]]. */
  object HeaderDecoder extends Decoder {
    def decode(id: Long, bytes: Array[Byte]): MediaFeatures =
      ImageCodec.parse(bytes) match {
        case Some(p) =>
          MediaFeatures(id, p.payloadBytes, p.width, p.height, p.frames)
        case None => FakeDecoder.decode(id, bytes)
      }
  }

  /** Typed image-metadata record from a real header parse. */
  final case class ImageMeta(doc_id: Long, fmt: String, width: Int,
                             height: Int, frames: Int, nbytes: Int)

  /** Image-encode input row: one image spec to containerize. */
  final case class ImageSpec(doc_id: Long, fmt: String, width: Int,
                             height: Int, frames: Int, payload: Array[Byte])

  /** Encode rows into REAL image containers, partition-wise. Input needs
    * (doc_id, fmt ∈ png|gif|jpeg, width, height, frames, payload BINARY);
    * output is the standard multimodal payload struct whose `content` is
    * a valid container carrying `payload` in its data segments. */
  def encodeImages(specs: DataFrame): DataFrame = {
    implicit val inEnc: Encoder[ImageSpec] = Encoders.product[ImageSpec]
    implicit val outEnc: Encoder[(Long, Array[Byte], String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY, Encoders.STRING)
    specs
      .select(col("doc_id").cast("long"), col("fmt"),
        col("width").cast("int"), col("height").cast("int"),
        col("frames").cast("int"), col("payload"))
      .as[ImageSpec]
      .mapPartitions(_.map { sp =>
        val bytes = sp.fmt match {
          case "png" => ImageCodec.encodePng(sp.width, sp.height, sp.payload)
          case "gif" =>
            ImageCodec.encodeGif(sp.width, sp.height, sp.frames, sp.payload)
          case "bmp"  => ImageCodec.encodeBmp(sp.width, sp.height, sp.payload)
          case "tiff" => ImageCodec.encodeTiff(sp.width, sp.height, sp.payload)
          case "webp" => ImageCodec.encodeWebp(sp.width, sp.height, sp.payload)
          case _      => ImageCodec.encodeJpeg(sp.width, sp.height, sp.payload)
        }
        (sp.doc_id, bytes, s"image/${sp.fmt}")
      })
      .toDF("doc_id", "content", "mime")
      .select(col("doc_id"), struct(col("content"), col("mime"),
        map(lit("codec"), col("mime")).as("meta")).as("payload"))
  }

  /** Decode payloads to typed image metadata via the real header parser;
    * unidentifiable bytes degrade to the stub features with
    * fmt='unknown'. */
  def decodeImageMeta(packed: DataFrame, idCol: String): Dataset[ImageMeta] = {
    implicit val enc: Encoder[ImageMeta] = Encoders.product[ImageMeta]
    implicit val inEnc: Encoder[(Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    packed.select(col(idCol).cast("long"), col("payload.content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        ImageCodec.parse(bytes) match {
          case Some(p) =>
            ImageMeta(id, p.fmt, p.width, p.height, p.frames, p.payloadBytes)
          case None =>
            val f = FakeDecoder.decode(id, bytes)
            ImageMeta(id, "unknown", f.width, f.height, f.frames, f.nbytes)
        }
      })
  }

  /** Typed audio-metadata record from a real WAV header parse. Durations
    * are integer-derived from the DECLARED header fields (`n_samples =
    * data_bytes / block_align`, `duration_ms = n_samples · 1000 /
    * sample_rate` — floored long arithmetic, engine-portable). */
  final case class AudioMeta(doc_id: Long, fmt: String, sample_rate: Int,
                             channels: Int, bits: Int, data_bytes: Int,
                             n_samples: Long, duration_ms: Long)

  /** WAV-encode input row: one PCM stream to containerize. */
  final case class WavSpec(doc_id: Long, sample_rate: Int, channels: Int,
                           bits: Int, payload: Array[Byte])

  /** [[audioFrames]]'s per-row framing geometry + carried data chunk. */
  final case class WavFrameSpec(doc_id: Long, sample_rate: Int,
                                frame_bytes: Int, hop_bytes: Int,
                                data_offset: Int, data: Array[Byte])

  /** Encode rows into REAL RIFF/WAVE containers, partition-wise (the
    * audio sibling of [[encodeImages]]). Input needs (doc_id,
    * sample_rate, channels, bits, payload BINARY); output is the standard
    * payload struct whose `content` is a valid PCM WAV carrying `payload`
    * as its data chunk. */
  def encodeWavs(specs: DataFrame): DataFrame = {
    implicit val inEnc: Encoder[WavSpec] = Encoders.product[WavSpec]
    implicit val outEnc: Encoder[(Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    specs
      .select(col("doc_id").cast("long"), col("sample_rate").cast("int"),
        col("channels").cast("int"), col("bits").cast("int"),
        col("payload"))
      .as[WavSpec]
      .mapPartitions(_.map { sp =>
        (sp.doc_id, AudioCodec.encodeWav(sp.sample_rate, sp.channels,
          sp.bits, sp.payload))
      })
      .toDF("doc_id", "content")
      .select(col("doc_id"), struct(col("content"),
        lit("audio/wav").as("mime"),
        map(lit("codec"), lit("audio/wav")).as("meta")).as("payload"))
  }

  /** Decode payloads to typed audio metadata via the real RIFF parser;
    * unidentifiable bytes degrade to fmt='unknown' with zeroed audio
    * fields and the raw byte length as data_bytes. */
  def decodeAudioMeta(packed: DataFrame, idCol: String): Dataset[AudioMeta] = {
    implicit val enc: Encoder[AudioMeta] = Encoders.product[AudioMeta]
    implicit val inEnc: Encoder[(Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    packed.select(col(idCol).cast("long"), col("payload.content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        AudioCodec.parse(bytes) match {
          case Some(p) =>
            val nSamples = p.dataBytes.toLong / p.blockAlign
            AudioMeta(id, "wav", p.sampleRate, p.channels, p.bits,
              p.dataBytes, nSamples, nSamples * 1000L / p.sampleRate)
          case None =>
            AudioMeta(id, "unknown", 0, 0, 0, bytes.length, 0L, 0L)
        }
      })
  }

  /** Time-based frame windows over each WAV's PCM data — [[frameWindows]]
    * with the geometry GENUINELY DECODED per row: `frame_bytes` /
    * `hop_bytes` derive from the parsed sample rate × block align (25 ms
    * frame / 10 ms hop is the classic STFT setup), and framing covers the
    * data CHUNK (parsed offset + length), never the container header.
    * The header parse is one typed partition-wise pass carrying the
    * content through; the fan-out stays native (frames staged in a
    * Project before posexplode) — per-partition, no shuffle. Rows whose
    * bytes aren't parseable WAV drop (unknown formats have no time
    * base). */
  def audioFrames(packed: DataFrame, idCol: String, frameMs: Int,
                  hopMs: Int): DataFrame = {
    require(frameMs >= 1 && hopMs >= 1, "frame and hop must be >= 1 ms")
    require(hopMs <= frameMs, "hop must not exceed the frame")
    implicit val inEnc: Encoder[(Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    // a case class, not a tuple: Encoders.tuple caps at 5 fields
    implicit val specEnc: Encoder[WavFrameSpec] =
      Encoders.product[WavFrameSpec]
    val specs = packed
      .select(col(idCol).cast("long"), col("payload.content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        AudioCodec.parse(bytes).map { p =>
          val bytesPerMs = p.sampleRate * p.blockAlign
          WavFrameSpec(id, p.sampleRate,
            math.max(bytesPerMs * frameMs / 1000, 1),
            math.max(bytesPerMs * hopMs / 1000, 1),
            p.dataOffset, bytes.slice(p.dataOffset,
              p.dataOffset + p.dataBytes))
        }
      })
      .toDF(idCol, "sample_rate", "frame_bytes", "hop_bytes",
        "data_offset", "data")
    val len = length(col("data"))
    val n = (lit(1) + ceil(greatest(len - col("frame_bytes"), lit(0))
      .cast("double") / col("hop_bytes")).cast("int"))
    val frames = transform(sequence(lit(0), n - 1),
      i => col("data").substr(i * col("hop_bytes") + 1, col("frame_bytes")))
    specs
      .select(col(idCol), col("sample_rate"), col("frame_bytes"),
        col("hop_bytes"), frames.as("__frames"))
      .select(col(idCol), col("sample_rate"), col("frame_bytes"),
        col("hop_bytes"), posexplode(col("__frames")))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame")
      .select(col(idCol), col("sample_rate"), col("frame_bytes"),
        col("frame_idx"),
        (col("frame_idx") * col("hop_bytes")).as("offset"),
        length(col("frame")).cast("int").as("nbytes"), col("frame"))
  }

  /** One row of the unified mixed-corpus manifest: whichever modality
    * the sniffer identified, with the other families' fields zeroed. */
  final case class MediaManifest(doc_id: Long, modality: String,
                                 fmt: String, width: Int, height: Int,
                                 frames: Int, sample_rate: Int,
                                 duration_ms: Long, data_bytes: Int)

  /** Route a MIXED media corpus through ONE manifest decode — the first
    * pass a real multimodal pipeline runs over a crawl: sniff each
    * payload's magic (image containers, then RIFF/WAVE, then ISO BMFF)
    * and emit the unified typed manifest row from whichever REAL parser
    * claims it; unidentifiable bytes degrade to modality='unknown'.
    * Partition-wise, no shuffle — the three header walkers compose
    * behind one sniffer. */
  def decodeMediaManifest(packed: DataFrame,
                          idCol: String): Dataset[MediaManifest] = {
    implicit val enc: Encoder[MediaManifest] = Encoders.product[MediaManifest]
    implicit val inEnc: Encoder[(Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    packed.select(col(idCol).cast("long"), col("payload.content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        ImageCodec.parse(bytes) match {
          case Some(p) =>
            MediaManifest(id, "image", p.fmt, p.width, p.height,
              p.frames, 0, 0L, p.payloadBytes)
          case None => AudioCodec.parse(bytes) match {
            case Some(p) =>
              val nSamples = p.dataBytes.toLong / p.blockAlign
              MediaManifest(id, "audio", "wav", 0, 0, 0, p.sampleRate,
                nSamples * 1000L / p.sampleRate, p.dataBytes)
            case None => FlacCodec.parse(bytes) match {
              case Some(p) =>
                MediaManifest(id, "audio", "flac", 0, 0, 0, p.sampleRate,
                  p.totalSamples * 1000L / p.sampleRate, p.dataBytes)
              case None => VideoCodec.parse(bytes) match {
                case Some(p) =>
                  MediaManifest(id, "video", "mp4", 0, 0, 0, 0,
                    p.durationTicks * 1000L / p.timescale, p.mdatBytes)
                case None =>
                  MediaManifest(id, "unknown", "unknown", 0, 0, 0, 0, 0L,
                    bytes.length)
              }
            }
          }
        }
      })
  }

  /** Pack a text column as a multimodal payload:
    * struct(content BINARY, mime STRING, meta MAP<STRING,STRING>). */
  def packPayload(df: DataFrame, idCol: String, textCol: String,
                  mime: String, metaCols: Seq[String]): DataFrame =
    df.select(col(idCol),
      struct(
        encode(col(textCol), "UTF-8").as("content"),
        lit(mime).as("mime"),
        map(metaCols.flatMap(m => Seq(lit(m), col(m).cast("string"))): _*)
          .as("meta")).as("payload"))

  /** Decode payloads partition-wise: one [[Decoder]] per partition (the
    * shape that amortizes per-process codec init), typed rows out. The
    * decode itself is an optimization barrier by nature (opaque bytes);
    * keep it LAST in the pipeline, after all pruning/filtering. */
  def decodeFeatures(packed: DataFrame, idCol: String,
                     decoder: Decoder): Dataset[MediaFeatures] = {
    implicit val enc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
    implicit val inEnc: Encoder[(Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    packed.select(col(idCol).cast("long"), col("payload.content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val d = decoder // per-partition instance
        it.map { case (id, bytes) => d.decode(id, bytes) }
      }
  }

  /** Resize plumbing: aspect-preserving fit of each media item into a
    * `maxW`×`maxH` box, never upscaling — the geometry every image
    * pipeline computes before the resample. Pure native expressions over
    * the decoded feature frame (the pixel resample itself belongs in the
    * partition-wise [[Decoder]], next to the codec). Adds
    * `scale` (6dp), `out_w`, `out_h` (floored, min 1). */
  def resizeToFit(features: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW).cast("double") / col("width"),
      lit(maxH).cast("double") / col("height"), lit(1.0))
    features
      .withColumn("scale", round(scale, 6))
      .withColumn("out_w",
        greatest(floor(col("width") * scale), lit(1)).cast("int"))
      .withColumn("out_h",
        greatest(floor(col("height") * scale), lit(1)).cast("int"))
  }

  /** ViT patch-grid manifest: the ⌈w/p⌉ × ⌈h/p⌉ patch layout a vision
    * transformer tokenizes per image, plus the visual token count
    * (patches + 1 CLS) — the budget planner image-token packing reads
    * before interleaving images into a text shard. Pure integer
    * arithmetic over the decoded feature frame; at 100 TB this is a
    * projected scan, no shuffle. */
  def patchGrid(features: DataFrame, patch: Int): DataFrame = {
    require(patch >= 1, "patch size must be >= 1")
    val px = ceil(col("width") / lit(patch.toDouble)).cast("int")
    val py = ceil(col("height") / lit(patch.toDouble)).cast("int")
    features.select(col("doc_id"), col("width"), col("height"),
      px.as("patches_x"), py.as("patches_y"),
      (px * py).as("n_patches"),
      (px * py + lit(1)).as("vis_tokens"))
  }

  /** Frame sampling plumbing: every `step`-th frame index per document,
    * exploded to (doc_id, frame_no) rows — the fan-out a video pipeline
    * feeds to per-frame feature extraction. */
  def sampleFrames(features: DataFrame, step: Int): DataFrame =
    features.select(col("doc_id"),
      explode(sequence(lit(0), col("frames") - 1, lit(step))).as("frame_no"))

  /** Segment each payload's binary content into fixed-size chunks — the
    * audio/video windowing shape (constant-duration segments feeding a
    * per-chunk decoder). Pure expressions: the chunk array is staged in a
    * Project BEFORE posexplode (Generate evaluates its generator input
    * interpreted), then fans out to (id, chunk_idx, offset, nbytes, chunk)
    * rows — per-partition, no shuffle, no driver state. The final chunk is
    * short (`len mod chunkBytes`), like a trailing audio frame; empty
    * content yields one empty chunk row. */
  def chunkPayload(packed: DataFrame, idCol: String,
                   chunkBytes: Int): DataFrame = {
    require(chunkBytes >= 1, "chunkBytes must be >= 1")
    val content = col("payload.content")
    val n = ceil(length(content).cast("double") / chunkBytes).cast("int")
    val chunks = transform(
      sequence(lit(0), greatest(n, lit(1)) - 1),
      i => content.substr(i * chunkBytes + 1, lit(chunkBytes)))
    packed
      .select(col(idCol), chunks.as("__chunks"))
      .select(col(idCol), posexplode(col("__chunks")))
      .toDF(idCol, "chunk_idx", "chunk")
      .select(col(idCol), col("chunk_idx"),
        (col("chunk_idx") * chunkBytes).as("offset"),
        length(col("chunk")).cast("int").as("nbytes"), col("chunk"))
  }

  /** Overlapping frame windows over each payload's bytes — the STFT /
    * feature-extraction framing shape (`hop` < `frameBytes` gives the
    * overlap a spectral pipeline needs; [[chunkPayload]] is the
    * hop == frame special case without it). Frame i covers
    * `[i·hop, i·hop + frameBytes)`; the last frame starts strictly
    * before the content end, so every byte lands in ≥ 1 frame and tail
    * frames run short. Same scale shape as chunkPayload: frames staged
    * BEFORE posexplode, per-partition fan-out, no shuffle. */
  def frameWindows(packed: DataFrame, idCol: String, frameBytes: Int,
                   hopBytes: Int): DataFrame = {
    require(frameBytes >= 1 && hopBytes >= 1,
      "frame and hop must be >= 1")
    require(hopBytes <= frameBytes, "hop must not exceed the frame")
    val content = col("payload.content")
    val len = length(content)
    // number of frames: 1 + ceil(max(0, len - frame) / hop)
    val n = (lit(1) + ceil(greatest(len - frameBytes, lit(0))
      .cast("double") / hopBytes).cast("int"))
    val frames = transform(sequence(lit(0), n - 1),
      i => content.substr(i * hopBytes + 1, lit(frameBytes)))
    packed
      .select(col(idCol), frames.as("__frames"))
      .select(col(idCol), posexplode(col("__frames")))
      .toDF(idCol, "frame_idx", "frame")
      .select(col(idCol), col("frame_idx"),
        (col("frame_idx") * hopBytes).as("offset"),
        length(col("frame")).cast("int").as("nbytes"), col("frame"))
  }
}
