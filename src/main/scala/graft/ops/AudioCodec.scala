package graft.ops

/** Minimal real audio codec for the multimodal path: RIFF/WAVE with
  * uncompressed 16-bit PCM (format tag 1), mono or multichannel — the one
  * audio container whose full decode fits in plain JVM code with no native
  * libraries, so the engine's audio feature extraction operates on ACTUAL
  * samples rather than a stubbed byte histogram (the same upgrade
  * ImageCodec gave the image path). Pure, allocation-bounded, decoded
  * inside the batched mapPartitions operator (Multimodal.extractFeatures).
  *
  * Decoded form: (sampleRate, channels, samples) with samples interleaved
  * by channel, one Short per sample.
  */
object AudioCodec {

  private def le32(p: Array[Byte], off: Int): Int =
    (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8) |
      ((p(off + 2) & 0xff) << 16) | ((p(off + 3) & 0xff) << 24)

  private def le16(p: Array[Byte], off: Int): Int =
    (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)

  /** Encode 16-bit PCM samples as a canonical RIFF/WAVE file (44-byte
    * header + little-endian samples). */
  def encodeWav(sampleRate: Int, samples: Array[Short],
      channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putAscii(off: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, out, off, b.length)
    }
    def putLe32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def putLe16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    putAscii(0, "RIFF"); putLe32(4, 36 + dataLen); putAscii(8, "WAVE")
    putAscii(12, "fmt "); putLe32(16, 16)
    putLe16(20, 1) // PCM
    putLe16(22, channels)
    putLe32(24, sampleRate)
    putLe32(28, sampleRate * channels * 2) // byte rate
    putLe16(32, channels * 2) // block align
    putLe16(34, 16) // bits per sample
    putAscii(36, "data"); putLe32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      putLe16(44 + i * 2, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Decode a RIFF/WAVE payload with 16-bit PCM data; walks the chunk list
    * (so extra chunks like LIST/INFO are skipped), returns None for
    * anything that is not well-formed PCM-16 WAV. */
  def decodeWav(p: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    if (p == null || p.length < 44) return None
    if (p(0) != 'R' || p(1) != 'I' || p(2) != 'F' || p(3) != 'F' ||
      p(8) != 'W' || p(9) != 'A' || p(10) != 'V' || p(11) != 'E') return None
    var off = 12
    var sampleRate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= p.length && (dataOff < 0 || sampleRate < 0)) {
      val id = new String(p, off, 4, "US-ASCII")
      val len = le32(p, off + 4)
      // Long arithmetic: len near Int.MaxValue wraps `off + 8 + len`
      // negative and would pass — then the sample loop reads off the end
      if (len < 0 || off + 8L + len > p.length) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          val tag = le16(p, off + 8)
          if (tag != 1) return None // PCM only
          channels = le16(p, off + 10)
          sampleRate = le32(p, off + 12)
          bits = le16(p, off + 22)
          if (bits != 16 || channels < 1 || sampleRate <= 0) return None
        case "data" =>
          dataOff = off + 8; dataLen = len
        case _ => () // skip unknown chunk
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (sampleRate < 0 || dataOff < 0) return None
    val n = dataLen / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = le16(p, dataOff + i * 2).toShort
      i += 1
    }
    Some((sampleRate, channels, samples))
  }

  /** 16-dim feature vector from decoded samples — the audio analog of the
    * image luminance histogram: a 16-bin absolute-amplitude histogram,
    * L1-normalized (deterministic, loudness-shape descriptor). */
  def amplitudeHistogram(samples: Array[Short]): Array[Float] = {
    val bins = new Array[Int](16)
    var i = 0
    while (i < samples.length) {
      val a = math.abs(samples(i).toInt)
      bins(math.min(15, a >> 11)) += 1
      i += 1
    }
    val total = math.max(1, samples.length)
    bins.map(_.toFloat / total)
  }
}
