package graft.ops

/** Minimal real image codec for the multimodal path: binary PPM (P6) and
  * uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB) — two formats whose
  * full decode fits in plain JVM code with no native libraries, so the
  * engine's image feature extraction operates on ACTUAL pixels rather than
  * a stubbed byte histogram (round-2 verdict item 10). Everything is pure
  * and allocation-bounded; rows decode inside the batched mapPartitions
  * operator (Multimodal.extractFeatures).
  *
  * Decoded form: (width, height, rgb) with rgb laid out row-major
  * top-down, 3 bytes per pixel (R, G, B).
  */
object ImageCodec {

  /** Encode RGB pixels as binary PPM (P6). */
  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"rgb length ${rgb.length} != ${w * h * 3}")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Decode a PPM (P6) or 24-bit BMP payload; None if the payload is
    * neither (or malformed). */
  def decode(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (payload == null || payload.length < 2) None
    else if (payload(0) == 'P' && payload(1) == '6') decodePpm(payload)
    else if (payload(0) == 'B' && payload(1) == 'M') decodeBmp(payload)
    else None
  }

  // ---- PPM (P6) ----

  private def decodePpm(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    // header: "P6" <ws> width <ws> height <ws> maxval <single ws> pixels;
    // '#' starts a comment to end-of-line (the full Netpbm grammar)
    var i = 2
    def skipWs(): Unit = {
      var go = true
      while (go && i < p.length) {
        val c = p(i).toChar
        if (c == '#') { while (i < p.length && p(i) != '\n') i += 1 }
        else if (c.isWhitespace) i += 1
        else go = false
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = 0L // Long accumulator: a hostile digit run must not wrap
      var any = false
      while (i < p.length && p(i) >= '0' && p(i) <= '9') {
        v = math.min(v * 10 + (p(i) - '0'), Int.MaxValue.toLong)
        i += 1; any = true
      }
      if (!any) -1 else v.toInt
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    if (w <= 0 || h <= 0 || maxval != 255) return None
    i += 1 // the single whitespace byte after maxval
    // Long arithmetic: w*h*3 with unbounded header dims wraps Int and a
    // wrapped-negative `need` would pass the bounds check, then throw in
    // copyOfRange — one corrupt row must never crash the stage
    val need = w.toLong * h * 3
    if (i + need > p.length) return None
    val rgb = java.util.Arrays.copyOfRange(p, i, i + need.toInt)
    Some((w, h, rgb))
  }

  // ---- BMP (24bpp, BI_RGB) ----

  private def le32(p: Array[Byte], off: Int): Int =
    (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8) |
      ((p(off + 2) & 0xff) << 16) | ((p(off + 3) & 0xff) << 24)
  private def le16(p: Array[Byte], off: Int): Int =
    (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)

  private def decodeBmp(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (p.length < 54) return None
    val dataOff = le32(p, 10)
    val hdrSize = le32(p, 14)
    if (hdrSize < 40) return None // BITMAPINFOHEADER or newer
    val w = le32(p, 18)
    val hRaw = le32(p, 22)
    val bottomUp = hRaw > 0 // negative height = top-down rows
    val h = math.abs(hRaw)
    val bpp = le16(p, 28)
    val compression = le32(p, 30)
    // h <= 0 also rejects hRaw == Int.MinValue (abs stays negative);
    // dataOff is attacker-controlled le32 — negative must be rejected
    // before it indexes p below
    if (w <= 0 || h <= 0 || bpp != 24 || compression != 0 ||
      dataOff < 54) return None
    val rowBytesL = (w.toLong * 3 + 3) & ~3L // rows pad to 4 bytes
    if (dataOff + rowBytesL * h > p.length) return None
    val rowBytes = rowBytesL.toInt // safe: rowBytesL * h bounded by p.length
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = dataOff + rowBytes * (if (bottomUp) h - 1 - y else y)
      var x = 0
      while (x < w) {
        val s = srcRow + x * 3
        val d = (y * w + x) * 3
        rgb(d) = p(s + 2) // BMP stores BGR
        rgb(d + 1) = p(s + 1)
        rgb(d + 2) = p(s)
        x += 1
      }
      y += 1
    }
    Some((w, h, rgb))
  }

  /** Encode RGB pixels as a bottom-up 24bpp BI_RGB BMP (test vector
    * producer + sink format). */
  def encodeBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3)
    val rowBytes = (w * 3 + 3) & ~3
    val dataSize = rowBytes * h
    val out = new Array[Byte](54 + dataSize)
    def putLe32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, 54 + dataSize); putLe32(10, 54)
    putLe32(14, 40); putLe32(18, w); putLe32(22, h)
    out(26) = 1; out(28) = 24
    putLe32(34, dataSize)
    var y = 0
    while (y < h) {
      val dstRow = 54 + rowBytes * (h - 1 - y)
      var x = 0
      while (x < w) {
        val s = (y * w + x) * 3
        val d = dstRow + x * 3
        out(d) = rgb(s + 2); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Nearest-neighbor resize (the real resize path behind
    * Multimodal.resizeImages). */
  def resizeNearest(w: Int, h: Int, rgb: Array[Byte], nw: Int,
      nh: Int): Array[Byte] = {
    val out = new Array[Byte](nw * nh * 3)
    var y = 0
    while (y < nh) {
      val sy = math.min(h - 1, y * h / nh)
      var x = 0
      while (x < nw) {
        val sx = math.min(w - 1, x * w / nw)
        val s = (sy * w + sx) * 3
        val d = (y * nw + x) * 3
        out(d) = rgb(s); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** 16-bin luminance histogram (ITU-R BT.601 integer weights),
    * L1-normalized — the feature vector the image path extracts from
    * DECODED pixels. */
  def luminanceHistogram(rgb: Array[Byte]): Array[Float] = {
    val bins = new Array[Int](16)
    var i = 0
    while (i + 2 < rgb.length) {
      val lum = ((rgb(i) & 0xff) * 299 + (rgb(i + 1) & 0xff) * 587 +
        (rgb(i + 2) & 0xff) * 114) / 1000
      bins(lum >> 4) += 1
      i += 3
    }
    val total = math.max(1, rgb.length / 3)
    bins.map(_.toFloat / total)
  }
}
