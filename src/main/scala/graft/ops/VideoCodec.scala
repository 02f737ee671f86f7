package graft.ops

/** Minimal REAL video codec for the multimodal path: YUV4MPEG2 ("Y4M") —
  * the public uncompressed interchange format (plain ASCII stream header
  * `YUV4MPEG2 W.. H.. ...\n`, then per frame an ASCII `FRAME...\n` marker
  * followed by raw planar YCbCr). Full decode fits in plain JVM code with
  * no native libraries, which upgrades the video branch from declared
  * stub to real for uncompressed payloads — COMPRESSED codecs (H.264 &
  * co.) still genuinely need native libraries this container lacks, so
  * non-Y4M payloads keep the deterministic stub fallback, loudly
  * documented in Multimodal.
  *
  * Supported colorspaces: the C420 family (420, 420jpeg, 420mpeg2,
  * 420paldv — chroma subsampled 2×2), C422 (2×1) and C444 (full). The
  * luma (Y) plane is returned per frame; features bin luma directly
  * (Y IS the BT.601 luminance the image path computes from RGB).
  * All size arithmetic is in Long with explicit bounds checks — hostile
  * headers must return None, never throw or wrap (the ImageCodec
  * hardening discipline).
  */
object VideoCodec {

  private val Magic = "YUV4MPEG2".getBytes("US-ASCII")

  /** Bytes per frame for (w, h, colorspace); None for unsupported. */
  private def frameBytes(w: Long, h: Long, cs: String): Option[Long] = {
    val luma = w * h
    cs match {
      case "420" | "420jpeg" | "420mpeg2" | "420paldv" =>
        // chroma planes are ceil(w/2) x ceil(h/2)
        Some(luma + 2L * (((w + 1) / 2) * ((h + 1) / 2)))
      case "422" => Some(luma + 2L * (((w + 1) / 2) * h))
      case "444" => Some(3L * luma)
      case _ => None
    }
  }

  /** Encode frames (each a FULL frame: Y plane then subsampled U, V
    * planes laid out per `colorspace`) as a Y4M stream. */
  def encodeY4m(w: Int, h: Int, colorspace: String,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    val fb = frameBytes(w, h, colorspace).getOrElse(
      throw new IllegalArgumentException(s"colorspace $colorspace"))
    require(frames.forall(_.length == fb),
      s"each frame must be $fb bytes for ${w}x$h C$colorspace")
    val header =
      s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C$colorspace\n".getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = java.nio.ByteBuffer.allocate(
      header.length + frames.map(f => marker.length + f.length).sum)
    out.put(header)
    frames.foreach { f => out.put(marker); out.put(f) }
    out.array()
  }

  /** Decode a Y4M payload to (width, height, lumaPlanes) — one w*h Y
    * plane per frame, chroma skipped. None on anything malformed:
    * wrong magic, unsupported colorspace, non-positive or overflowing
    * dims, truncated frames, missing FRAME markers. */
  def decodeY4m(payload: Array[Byte]): Option[(Int, Int, Seq[Array[Byte]])] = {
    if (payload == null || payload.length < Magic.length + 1) return None
    var i = 0
    while (i < Magic.length) {
      if (payload(i) != Magic(i)) return None
      i += 1
    }
    // stream header: space-separated parameter tokens up to '\n'
    val hdrEnd = payload.indexOf('\n'.toByte, i)
    if (hdrEnd < 0) return None
    val params = new String(payload, i, hdrEnd - i, "US-ASCII")
      .split(' ').filter(_.nonEmpty)
    var w = -1L; var h = -1L; var cs = "420jpeg" // Y4M default colorspace
    params.foreach { p =>
      val v = p.drop(1)
      p.charAt(0) match {
        case 'W' => w = v.toLongOption.getOrElse(-1L)
        case 'H' => h = v.toLongOption.getOrElse(-1L)
        case 'C' => cs = v
        case _ => () // F (rate), I (interlace), A (aspect), X (comment)
      }
    }
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) return None
    val fb = frameBytes(w, h, cs).getOrElse(return None)
    if (fb > Int.MaxValue) return None
    val luma = (w * h).toInt
    val frames = Seq.newBuilder[Array[Byte]]
    var pos = hdrEnd + 1
    while (pos < payload.length) {
      // frame marker: "FRAME" + optional params, terminated by '\n'
      if (pos + 5 > payload.length) return None
      if (payload(pos) != 'F' || payload(pos + 1) != 'R' ||
          payload(pos + 2) != 'A' || payload(pos + 3) != 'M' ||
          payload(pos + 4) != 'E') return None
      val mEnd = payload.indexOf('\n'.toByte, pos + 5)
      if (mEnd < 0) return None
      val dataStart = mEnd + 1
      if (dataStart.toLong + fb > payload.length) return None
      frames += java.util.Arrays.copyOfRange(payload, dataStart,
        dataStart + luma)
      pos = dataStart + fb.toInt
    }
    val fs = frames.result()
    if (fs.isEmpty) None else Some((w.toInt, h.toInt, fs))
  }

  /** 16-bin histogram over the luma bytes of all frames, L1-normalized —
    * bin = Y >> 4, the same binning the image path applies to its BT.601
    * luminance. */
  def lumaHistogram(lumaPlanes: Seq[Array[Byte]]): Array[Float] = {
    val bins = new Array[Int](16)
    var total = 0L
    lumaPlanes.foreach { p =>
      var i = 0
      while (i < p.length) { bins((p(i) & 0xff) >> 4) += 1; i += 1 }
      total += p.length
    }
    val t = math.max(1L, total)
    bins.map(_.toFloat / t)
  }
}
