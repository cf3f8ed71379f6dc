package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM RIFF/WAVE PCM codec — the REAL decode kernel for the
  * multimodal pipeline's audio path (no codec libraries ship in this
  * environment, but WAV needs none: the container is a RIFF chunk list
  * and the payload is raw PCM).
  *
  * Scope: canonical little-endian RIFF/WAVE with a `fmt ` chunk of
  * audio format 1 (integer PCM), 8-bit unsigned or 16-bit signed
  * samples, any channel count, and a `data` chunk. Unknown chunks
  * (LIST/INFO/fact/…) are skipped by their declared size, like any
  * compliant reader. Anything else — wrong magic, truncated chunk,
  * compressed format, odd bit depth — returns None: the undecodable
  * path, which the pipeline routes to byte-level fallback features
  * exactly as a production pipeline dead-letters undecodable media.
  *
  * Reference role: the reference's media columns are opaque strings
  * (e.g. `event_details`, screen metadata); decode-side processing is
  * the training-pipeline extension (SURVEY §7-M5), not a reference
  * behavior — hence a public-spec container format.
  */
object WavCodec {

  /** Decoded audio: raw integer samples, channel-interleaved.
    * 8-bit samples are centered (unsigned byte - 128) so silence is 0
    * at every bit depth. */
  final case class Wav(sampleRate: Int, channels: Int, bitsPerSample: Int,
                       samples: Array[Int]) {
    def nFrames: Int = if (channels == 0) 0 else samples.length / channels
    def durationMs: Long =
      if (sampleRate == 0) 0L else nFrames.toLong * 1000L / sampleRate
  }

  /** Audio-domain features off decoded samples — what the byte-stat
    * fallback can never see (a byte histogram knows nothing of sample
    * width or sign). sumSq is exact integer arithmetic so RMS is
    * reproducible bit-for-bit at any execution order. */
  final case class WavFeatures(nSamples: Int, peak: Int, rms: Double,
                               zeroCrossings: Int)

  // ------------------------------ encode ------------------------------

  /** Canonical 16-bit PCM writer (test/synthesis side of the round trip:
    * the pipeline's inputs are produced elsewhere; specs and the oracled
    * catalog query synthesize known signals through it). */
  def encodePcm16(samples: Array[Short], sampleRate: Int,
                  channels: Int = 1): Array[Byte] = {
    require(channels > 0, "channels must be positive")
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  // ------------------------------ decode ------------------------------

  /** Parse RIFF/WAVE bytes to samples; None on anything non-canonical. */
  def decode(bytes: Array[Byte]): Option[Wav] = {
    if (bytes.length < 44) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    if (tag() != "RIFF") return None
    buf.getInt // declared riff size; tolerated if it disagrees (common)
    if (tag() != "WAVE") return None

    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None     // (offset, length)
    // chunk walk: every chunk is (tag, int32 size, payload, pad-to-even)
    while (buf.remaining() >= 8 && data.isEmpty) {
      val t = tag()
      val size = buf.getInt
      if (size < 0 || size > buf.remaining()) return None // truncated
      // pad-to-even skips are CLAMPED to the limit: a final odd-sized
      // chunk may legitimately omit its pad byte at EOF, and an
      // unclamped position(pos + size + 1) would throw
      // IllegalArgumentException instead of the contract's None/parse
      def skipTo(target: Int): Unit =
        buf.position(math.min(target, buf.limit()))
      t match {
        case "fmt " =>
          if (size < 16) return None
          val p = buf.position()
          val audioFormat = buf.getShort & 0xffff
          val channels = buf.getShort & 0xffff
          val rate = buf.getInt
          buf.getInt   // byte rate (derived, ignored)
          buf.getShort // block align (derived, ignored)
          val bits = buf.getShort & 0xffff
          if (audioFormat != 1 || channels == 0 || rate <= 0 ||
              (bits != 8 && bits != 16)) return None
          fmt = Some((channels, rate, bits))
          skipTo(p + size + (size & 1))
        case "data" =>
          data = Some((buf.position(), size))
        case _ =>
          skipTo(buf.position() + size + (size & 1)) // skip chunk
      }
    }
    for ((channels, rate, bits) <- fmt; (off, len) <- data) yield {
      val bytesPer = bits / 8
      val n = len / bytesPer
      val samples = new Array[Int](n)
      val d = ByteBuffer.wrap(bytes, off, len).order(ByteOrder.LITTLE_ENDIAN)
      var i = 0
      if (bits == 16) while (i < n) { samples(i) = d.getShort.toInt; i += 1 }
      else while (i < n) { samples(i) = (d.get() & 0xff) - 128; i += 1 }
      Wav(rate, channels, bits, samples)
    }
  }

  /** Sample-domain features. RMS goes through an exact integer sum of
    * squares (|s| <= 32768 ⇒ s² <= 2³⁰; overflow needs > 2³³ samples —
    * 25h of 48 kHz stereo — guarded anyway by widening to Long), so the
    * double math is one division + one sqrt: order-independent,
    * engine-reproducible. Zero crossings are strict sign flips
    * (s[i-1]·s[i] < 0) WITHIN each channel — the sample array is
    * channel-interleaved, so the predecessor of sample i is i−channels;
    * comparing adjacent interleaved samples would count L↔R polarity
    * differences as crossings (constant L=+x, R=−x has ZCR 0, not n−1).
    * The reported count sums the per-channel temporal crossings. */
  def features(w: Wav): WavFeatures = {
    var sumSq = 0L
    var peak = 0
    var zc = 0
    var i = 0
    val s = w.samples
    val ch = math.max(1, w.channels)
    while (i < s.length) {
      val v = s(i)
      sumSq += v.toLong * v
      if (math.abs(v) > peak) peak = math.abs(v)
      if (i >= ch && s(i - ch).toLong * v < 0) zc += 1
      i += 1
    }
    val rms = if (s.isEmpty) 0.0 else math.sqrt(sumSq.toDouble / s.length)
    WavFeatures(s.length, peak, rms, zc)
  }
}
