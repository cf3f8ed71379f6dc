package graft.pipeline

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

import org.scalatest.funsuite.AnyFunSuite

class PngCodecSpec extends AnyFunSuite {

  private def synthRgb(w: Int, h: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h * 3)(i => (i * 31 + seed * 7) % 256)

  test("encode/decode round trip preserves every sample") {
    for ((w, h, seed) <- Seq((1, 1, 0), (7, 3, 1), (16, 12, 2), (33, 9, 3))) {
      val rgb = synthRgb(w, h, seed)
      val img = PngCodec.decode(PngCodec.encodeRgb8(w, h, rgb))
        .getOrElse(fail(s"decode failed for ${w}x$h"))
      assert(img.width == w && img.height == h && img.channels == 3)
      assert(img.samples.sameElements(rgb), s"pixel mismatch at ${w}x$h")
    }
  }

  test("all five scanline filters reconstruct correctly") {
    // hand-build a PNG whose row y uses filter y%5, filtering FORWARD from
    // known pixels; the decoder must invert every filter exactly
    val w = 6; val h = 10; val ch = 3; val stride = w * ch
    val px = synthRgb(w, h, 9)
    val raw = new Array[Byte](h * (1 + stride))
    for (y <- 0 until h) {
      val f = y % 5
      raw(y * (1 + stride)) = f.toByte
      for (x <- 0 until stride) {
        val orig = px(y * stride + x)
        val left = if (x >= ch) px(y * stride + x - ch) else 0
        val up = if (y > 0) px((y - 1) * stride + x) else 0
        val ul = if (y > 0 && x >= ch) px((y - 1) * stride + x - ch) else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
        }
        raw(y * (1 + stride) + 1 + x) = ((orig - pred) & 0xff).toByte
      }
    }
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
        (v >>> 8).toByte, v.toByte)
      out.write(be(data.length))
      val t = typ.getBytes("US-ASCII")
      out.write(t); out.write(data)
      val crc = new CRC32(); crc.update(t); crc.update(data)
      out.write(be(crc.getValue.toInt))
    }
    val ihdr = new Array[Byte](13)
    ihdr(3) = w.toByte; ihdr(7) = h.toByte; ihdr(8) = 8; ihdr(9) = 2
    chunk("IHDR", ihdr)
    val d = new Deflater(); d.setInput(raw); d.finish()
    val zOut = new ByteArrayOutputStream(); val buf = new Array[Byte](4096)
    while (!d.finished()) zOut.write(buf, 0, d.deflate(buf))
    chunk("IDAT", zOut.toByteArray)
    chunk("IEND", Array.emptyByteArray)

    val img = PngCodec.decode(out.toByteArray)
      .getOrElse(fail("decode of all-filters png failed"))
    assert(img.samples.sameElements(px), "filter inversion mismatch")
  }

  test("corrupted CRC, truncated stream, and non-png bytes all return None") {
    val good = PngCodec.encodeRgb8(4, 4, synthRgb(4, 4, 5))
    val badCrc = good.clone(); badCrc(good.length - 5) = (badCrc(good.length - 5) ^ 0xff).toByte
    // flip a byte inside IHDR's CRC region
    val badIhdrCrc = good.clone(); badIhdrCrc(29) = (badIhdrCrc(29) ^ 0x01).toByte
    assert(PngCodec.decode(badIhdrCrc).isEmpty, "IHDR CRC corruption must fail")
    assert(PngCodec.decode(good.take(good.length / 2)).isEmpty, "truncation must fail")
    assert(PngCodec.decode("not a png at all".getBytes).isEmpty)
    assert(PngCodec.decode(Array.emptyByteArray).isEmpty)
  }

  test("features accumulate exact integer sums") {
    // 2x1 RGB: (10,20,30), (50,60,70)
    val img = PngCodec.Image(2, 1, 3, Array(10, 20, 30, 50, 60, 70))
    val f = PngCodec.features(img)
    assert(f.nPixels == 2)
    assert(f.meanR == 30.0 && f.meanG == 40.0 && f.meanB == 50.0)
    // luma = (299r + 587g + 114b)/1000 averaged
    val expected = ((299 * 10 + 587 * 20 + 114 * 30) +
      (299 * 50 + 587 * 60 + 114 * 70)) / 2000.0
    assert(f.meanLuma == expected)
  }
}
