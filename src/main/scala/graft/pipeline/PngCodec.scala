package graft.pipeline

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal REAL PNG codec — pure JVM, no image library: the PNG
  * container is chunked (length / type / data / CRC32) around a single
  * zlib stream of filtered scanlines, and both zlib and CRC32 ship in
  * `java.util.zip`, so (like RIFF/WAVE in [[WavCodec]]) the real format
  * is decodable without any native codec.
  *
  * Scope: 8-bit truecolor (RGB, color type 2) and truecolor+alpha
  * (RGBA, 6), non-interlaced — the shape ML image pipelines feed. The
  * DECODER implements the full scanline-filter spec (None/Sub/Up/
  * Average/Paeth) and verifies chunk CRCs; the encoder emits filter 0
  * scanlines (always valid PNG). Anything else (palette, 16-bit,
  * interlace, bad CRC, truncated stream) returns None and the caller
  * falls back to byte-level stats — the undecodable-media route.
  */
object PngCodec {

  /** Decoded image: 0..255 samples, row-major, channel-interleaved. */
  final case class Image(width: Int, height: Int, channels: Int,
                         samples: Array[Int])

  private val Sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  // ---- encode ----------------------------------------------------------

  /** Encode 8-bit RGB pixels (length w·h·3) as a spec-valid PNG. */
  def encodeRgb8(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"expected ${w * h * 3} samples, got ${rgb.length}")
    val stride = w * 3
    val raw = new Array[Byte](h * (1 + stride))
    var p = 0; var i = 0
    var y = 0
    while (y < h) {
      raw(p) = 0 // filter type None
      p += 1
      var x = 0
      while (x < stride) { raw(p) = rgb(i).toByte; p += 1; i += 1; x += 1 }
      y += 1
    }
    val ihdr = new Array[Byte](13)
    writeIntBE(ihdr, 0, w); writeIntBE(ihdr, 4, h)
    ihdr(8) = 8   // bit depth
    ihdr(9) = 2   // color type: truecolor
    // compression 0, filter 0, interlace 0 already zeroed
    val out = new ByteArrayOutputStream()
    out.write(Sig)
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", deflate(raw))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def writeIntBE(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v >>> 24).toByte; a(off + 1) = (v >>> 16).toByte
    a(off + 2) = (v >>> 8).toByte; a(off + 3) = v.toByte
  }

  private def writeChunk(out: ByteArrayOutputStream, typ: String,
                         data: Array[Byte]): Unit = {
    val len = new Array[Byte](4); writeIntBE(len, 0, data.length)
    out.write(len)
    val t = typ.getBytes("US-ASCII")
    out.write(t); out.write(data)
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    val c = new Array[Byte](4); writeIntBE(c, 0, crc.getValue.toInt)
    out.write(c)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  // ---- decode ----------------------------------------------------------

  /** Strict decode: CRCs verified, full filter support; None on anything
    * outside the supported profile or malformed. */
  def decode(bytes: Array[Byte]): Option[Image] = try {
    if (bytes.length < 8 || !Sig.indices.forall(i => bytes(i) == Sig(i)))
      return None
    var pos = 8
    var w = 0; var h = 0; var colorType = -1; var channels = 0
    val idat = new ByteArrayOutputStream()
    var sawEnd = false
    def readIntBE(off: Int): Int =
      ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
    while (!sawEnd && pos + 12 <= bytes.length) {
      val len = readIntBE(pos)
      if (len < 0 || pos + 12 + len > bytes.length) return None
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      if (crc.getValue.toInt != readIntBE(pos + 8 + len)) return None
      typ match {
        case "IHDR" =>
          // spec-fixed 13-byte payload: a shorter chunk would make the
          // field reads below fall OUTSIDE the CRC-covered region (e.g.
          // len=0 reads the chunk's own CRC as width) — strict decode
          // means no header byte escapes its checksum
          if (len != 13) return None
          w = readIntBE(pos + 8); h = readIntBE(pos + 12)
          val bitDepth = bytes(pos + 16) & 0xff
          colorType = bytes(pos + 17) & 0xff
          val interlace = bytes(pos + 20) & 0xff
          channels = colorType match { case 2 => 3; case 6 => 4; case _ => 0 }
          if (bitDepth != 8 || channels == 0 || interlace != 0 ||
              w <= 0 || h <= 0) return None
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => sawEnd = true
        case _ => // ancillary chunk: skip
      }
      pos += 12 + len
    }
    if (!sawEnd || w == 0) return None
    val stride = w * channels
    val raw = inflate(idat.toByteArray, h * (1 + stride))
    if (raw.length != h * (1 + stride)) return None
    // unfilter (PNG spec §9: None / Sub / Up / Average / Paeth)
    val px = new Array[Int](h * stride)
    var y = 0
    while (y < h) {
      val filter = raw(y * (1 + stride)) & 0xff
      val rowOff = y * (1 + stride) + 1
      val outOff = y * stride
      var x = 0
      while (x < stride) {
        val rawB = raw(rowOff + x) & 0xff
        val left = if (x >= channels) px(outOff + x - channels) else 0
        val up = if (y > 0) px(outOff - stride + x) else 0
        val upLeft = if (y > 0 && x >= channels) px(outOff - stride + x - channels) else 0
        val rec = filter match {
          case 0 => rawB
          case 1 => rawB + left
          case 2 => rawB + up
          case 3 => rawB + (left + up) / 2
          case 4 => rawB + paeth(left, up, upLeft)
          case _ => return None
        }
        px(outOff + x) = rec & 0xff
        x += 1
      }
      y += 1
    }
    Some(Image(w, h, channels, px))
  } catch { case _: Exception => None }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def inflate(z: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(z)
    val out = new ByteArrayOutputStream(expected)
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsInput()) {
      val n = inf.inflate(buf)
      if (n == 0 && !inf.finished()) return out.toByteArray // truncated
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  // ---- features --------------------------------------------------------

  final case class Features(nPixels: Int, meanR: Double, meanG: Double,
                            meanB: Double, meanLuma: Double)

  /** Channel means + integer-weighted luma (Rec.601 ×1000), accumulated
    * as exact integer sums — one divide at the end, so a differential
    * oracle recomputing from the pixel formula hash-matches. */
  def features(img: Image): Features = {
    val n = img.width * img.height
    var r = 0L; var g = 0L; var b = 0L; var luma = 0L
    var i = 0
    while (i < n) {
      val off = i * img.channels
      val rv = img.samples(off); val gv = img.samples(off + 1)
      val bv = img.samples(off + 2)
      r += rv; g += gv; b += bv
      luma += 299L * rv + 587L * gv + 114L * bv
      i += 1
    }
    Features(n, r.toDouble / n, g.toDouble / n, b.toDouble / n,
      luma.toDouble / (1000.0 * n))
  }
}
