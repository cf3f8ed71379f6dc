package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

import graft.TestSession
import org.scalatest.funsuite.AnyFunSuite

/** The REAL audio decode kernel (RIFF/WAVE PCM, pure JVM) and its
  * integration as the multimodal pipeline's audio path. */
class WavCodecSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("PCM16 encode -> decode round trip preserves format and every sample") {
    val samples = Array.tabulate(500)(i => ((i * 131) % 60001 - 30000).toShort)
    val wav = WavCodec.decode(WavCodec.encodePcm16(samples, 22050)).get
    assert(wav.sampleRate == 22050 && wav.channels == 1 && wav.bitsPerSample == 16)
    assert(wav.samples.toSeq == samples.map(_.toInt).toSeq)
    assert(wav.nFrames == 500)
    assert(wav.durationMs == 500L * 1000 / 22050)
  }

  test("8-bit PCM decodes centered; unknown chunks are skipped by size") {
    // hand-built canonical bytes: RIFF/WAVE, a LIST chunk a naive reader
    // would trip on, fmt (8-bit mono 8kHz), then data [0, 128, 255]
    val data = Array[Byte](0, 128.toByte, 255.toByte)
    val listPayload = "INFOjunk".getBytes("US-ASCII")
    val buf = ByteBuffer.allocate(12 + (8 + listPayload.length) + 24 + 8 + data.length + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(0) // size disagreement tolerated
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("LIST".getBytes("US-ASCII")).putInt(listPayload.length).put(listPayload)
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
    buf.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    val wav = WavCodec.decode(java.util.Arrays.copyOf(buf.array(), buf.position())).get
    assert(wav.bitsPerSample == 8 && wav.sampleRate == 8000)
    assert(wav.samples.toSeq == Seq(-128, 0, 127), "8-bit samples center at 0")
  }

  test("non-canonical payloads are None (the byte-stat fallback route), never a crash") {
    assert(WavCodec.decode("not audio at all".getBytes).isEmpty)
    assert(WavCodec.decode(Array.empty[Byte]).isEmpty)
    val good = WavCodec.encodePcm16(Array.tabulate(64)(_.toShort), 8000)
    assert(WavCodec.decode(java.util.Arrays.copyOf(good, 50)).isEmpty, "truncated data chunk")
    // flip the audio-format field to 3 (IEEE float): unsupported -> None
    val float = good.clone(); float(20) = 3
    assert(WavCodec.decode(float).isEmpty)
    // a data chunk whose declared size overruns the buffer
    val overrun = good.clone()
    val lenOff = 40 // data size field of the canonical 44-byte header
    ByteBuffer.wrap(overrun).order(ByteOrder.LITTLE_ENDIAN).putInt(lenOff, 1 << 20)
    assert(WavCodec.decode(overrun).isEmpty)
    // a trailing ODD-sized unknown chunk whose size exactly fills the
    // buffer: the pad-to-even skip lands one byte past the limit and
    // must clamp (contract: None), not throw IllegalArgumentException
    val oddTail = ByteBuffer.allocate(12 + 8 + 45).order(ByteOrder.LITTLE_ENDIAN)
    oddTail.put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + 45)
      .put("WAVE".getBytes("US-ASCII"))
      .put("LIST".getBytes("US-ASCII")).putInt(45)
      .put(Array.fill[Byte](45)(7))
    assert(WavCodec.decode(oddTail.array()).isEmpty)
    // same shape inside a valid file: odd LIST chunk between fmt and
    // data, pad byte present — must still decode
    val samples = Array.tabulate(16)(_.toShort)
    val base = WavCodec.encodePcm16(samples, 8000)
    val withOdd = ByteBuffer.allocate(base.length + 8 + 5 + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    withOdd.put(base, 0, 36) // RIFF..WAVE + fmt chunk
      .put("LIST".getBytes("US-ASCII")).putInt(5)
      .put(Array.fill[Byte](5)(3)).put(0.toByte) // odd payload + pad
      .put(base, 36, base.length - 36) // data chunk
    ByteBuffer.wrap(withOdd.array()).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(4, withOdd.array().length - 8)
    val decoded = WavCodec.decode(withOdd.array())
    assert(decoded.exists(_.samples.sameElements(samples.map(_.toInt))))
  }

  test("features are analytic: square wave has RMS = A, ZCR = flips, peak = A") {
    // 100 samples alternating +1000/-1000: |s| = 1000 everywhere
    val sq = Array.tabulate(100)(i => (if (i % 2 == 0) 1000 else -1000).toShort)
    val f = WavCodec.features(WavCodec.decode(WavCodec.encodePcm16(sq, 8000)).get)
    assert(f.nSamples == 100 && f.peak == 1000)
    assert(f.rms == 1000.0, "constant-magnitude signal: RMS exactly A")
    assert(f.zeroCrossings == 99, "every adjacent pair flips sign")
    // silence: all-zero features, no NaN
    val z = WavCodec.features(WavCodec.decode(
      WavCodec.encodePcm16(new Array[Short](10), 8000)).get)
    assert(z.rms == 0.0 && z.peak == 0 && z.zeroCrossings == 0)
  }

  test("pipeline integration: decodable audio gets real RMS bands, text gets byte fallback") {
    import spark.implicits._
    // band-structured signal: quarters at amplitude 0 / 8192 / 16384 / 32767
    val amps = Array(0, 8192, 16384, 32767)
    val samples = Array.tabulate(400) { i =>
      val a = amps(i / 100); (if (i % 2 == 0) a else -a).toShort
    }
    val wavBytes = WavCodec.encodePcm16(samples, 16000)
    val media = Seq(
      MediaRow(1L, "audio/wav", wavBytes),
      MediaRow(2L, "audio/wav", "plain text pretending to be audio".getBytes),
      MediaRow(3L, "video/mp4", wavBytes) // non-audio mime: fallback even if decodable
    ).toDS()
    val feats = Multimodal.extractFeatures(media).collect()
      .map(f => f.doc_id -> f).toMap
    val bands = feats(1L).thumb
    assert(bands.length == 4)
    amps.zip(bands).foreach { case (a, b) =>
      assert(math.abs(b - a / 32768f) < 1e-6, s"band for amplitude $a was $b")
    }
    // fallback thumbs are byte-quarter means in [0,1] — ASCII text bytes
    // sit in 0x20..0x7e, so every band lands strictly inside (0.1, 0.5)
    assert(feats(2L).thumb.forall(b => b > 0.1f && b < 0.5f))
    // same bytes under a video mime must take the byte fallback, not the
    // audio kernel — identical to byteStats on the raw payload
    assert(feats(3L).thumb.toSeq == Multimodal.byteStats(wavBytes)._3.toSeq)
    assert(feats(3L).thumb.toSeq != bands.toSeq)
  }

  test("stereo ZCR is per-channel temporal, not interleave polarity flips") {
    def stereo(frames: Int, l: Int => Short, r: Int => Short): WavCodec.Wav = {
      val buf = ByteBuffer.allocate(44 + frames * 4).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + frames * 4)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(2).putInt(8000).putInt(8000 * 4)
        .putShort(4).putShort(16)
      buf.put("data".getBytes("US-ASCII")).putInt(frames * 4)
      (0 until frames).foreach(i => buf.putShort(l(i)).putShort(r(i)))
      WavCodec.decode(buf.array()).get
    }
    // constant L=+1000 / R=-1000: per-channel ZCR is 0 — counting
    // adjacent INTERLEAVED samples would report every L↔R transition
    val flat = stereo(100, _ => 1000, _ => -1000)
    assert(flat.channels == 2 && flat.nFrames == 100)
    assert(WavCodec.features(flat).zeroCrossings == 0,
      "interleave polarity flips are not crossings")
    // both channels alternate sign per frame: 99 crossings each, 198 total
    val alt = stereo(100, i => (if (i % 2 == 0) 1000 else -1000).toShort,
      i => (if (i % 2 == 0) -1000 else 1000).toShort)
    assert(WavCodec.features(alt).zeroCrossings == 198)
    // mono is unchanged by the channel-stride fix (the oracle regime)
    val mono = WavCodec.decode(WavCodec.encodePcm16(
      Array.tabulate(100)(i => (if (i % 2 == 0) 500 else -500).toShort), 8000)).get
    assert(WavCodec.features(mono).zeroCrossings == 99)
  }
}
