package graft.ops

/** REAL compressed-video decode for the multimodal path: GIF87a/GIF89a.
  * Animated GIF is the one genuinely LZW-COMPRESSED multi-frame format a
  * plain JVM can decode with no native libraries, which closes the last
  * declared stub in the media branch — H.264-class codecs still truly
  * need natives the container lacks, and those payloads keep the loud
  * Multimodal fallback.
  *
  * Full decode: logical-screen descriptor, global/local color tables,
  * graphic-control extensions (transparency + disposal 0/1/2/3),
  * interlaced frames (four-pass), variable-width LSB-first LZW with
  * clear/EOI and KwKwK handling, frame compositing onto the logical
  * screen. Frames are returned as w*h luma planes (ITU-R BT.601 integer
  * weights, `(299r+587g+114b)/1000` — the ImageCodec convention) so the
  * feature path bins them exactly like Y4M luma.
  *
  * Hostile-input discipline (the ImageCodec/VideoCodec hardening rules):
  * all size arithmetic bounds-checked, dimension and area caps before any
  * allocation, truncated or over-long streams return None — never throw,
  * never wrap.
  */
object GifCodec {

  private val MaxDim = 1 << 14 // 16384 px per side
  private val MaxArea = 1L << 26 // 64 Mpx logical screen
  private val MaxFrames = 4096

  /** Encode palette-index frames as an animated GIF89a (global color
    * table, full-frame sequential images, no transparency) — the
    * synthesis-side counterpart of `decode`, used to plant REAL
    * LZW-compressed video payloads (q19 oracle rows), exactly as
    * ImageCodec.encodePpm / AudioCodec.encodeWav / VideoCodec.encodeY4m
    * plant the other media kinds. Round-trip independence is preserved
    * by GifCodecSpec, which checks `decode` against its OWN separate
    * in-test encoder. Standard early-change variable-width LZW. */
  def encode(w: Int, h: Int, palette: Array[(Int, Int, Int)],
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w > 0 && h > 0 && palette.nonEmpty && palette.length <= 256)
    require(frames.forall(_.length == w * h))
    var gb = 0
    while ((2 << gb) < palette.length) gb += 1
    val out = Array.newBuilder[Byte]
    def le16(v: Int): Unit = {
      out += (v & 0xff).toByte; out += ((v >> 8) & 0xff).toByte
    }
    out ++= "GIF89a".getBytes("US-ASCII")
    le16(w); le16(h)
    out += (0x80 | (gb << 4) | gb).toByte
    out += 0.toByte // background index
    out += 0.toByte // aspect
    for (i <- 0 until (2 << gb)) {
      val (r, g, b) = if (i < palette.length) palette(i) else (0, 0, 0)
      out += r.toByte; out += g.toByte; out += b.toByte
    }
    val mcs = math.max(2, gb + 1)
    for (f <- frames) {
      out += 0x2c.toByte
      le16(0); le16(0); le16(w); le16(h)
      out += 0.toByte // no LCT, sequential
      out += mcs.toByte
      val data = lzwEncode(f, mcs)
      var off = 0
      while (off < data.length) {
        val n = math.min(255, data.length - off)
        out += n.toByte
        out ++= java.util.Arrays.copyOfRange(data, off, off + n)
        off += n
      }
      out += 0.toByte // sub-block terminator
    }
    out += 0x3b.toByte
    out.result()
  }

  /** GIF-variant LZW with the standard early width change (GIFCOMPR.C
    * convention `decode` mirrors): the width check runs after each
    * emit, before the add that follows it; dictionary capped at 4096
    * (no adds past the cap — `decode` tolerates, as real decoders do).
    */
  private def lzwEncode(indices: Array[Byte], mcs: Int): Array[Byte] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val dict = new java.util.HashMap[Integer, Integer]()
    var codeSize = mcs + 1
    var nextCode = eoi + 1
    val out = Array.newBuilder[Byte]
    var acc = 0L
    var nbits = 0
    def emit(code: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += codeSize
      while (nbits >= 8) {
        out += (acc & 0xff).toByte; acc >>>= 8; nbits -= 8
      }
      if (nextCode >= (1 << codeSize) && codeSize < 12) codeSize += 1
    }
    emit(clear)
    var prev = indices(0) & 0xff
    var i = 1
    while (i < indices.length) {
      val k = indices(i) & 0xff
      val key = (prev << 8) | k
      val hit = dict.get(key)
      if (hit != null) prev = hit
      else {
        emit(prev)
        if (nextCode < 4096) { dict.put(key, nextCode); nextCode += 1 }
        prev = k
      }
      i += 1
    }
    emit(prev)
    emit(eoi)
    if (nbits > 0) out += (acc & 0xff).toByte
    out.result()
  }

  /** Decode a GIF payload to (width, height, lumaPlanes) — one w*h plane
    * per frame, composited (each plane is the full logical screen as of
    * that frame). None on anything malformed. */
  def decode(payload: Array[Byte]): Option[(Int, Int, Seq[Array[Byte]])] = {
    if (payload == null || payload.length < 14) return None
    val hdr = new String(payload, 0, 6, "US-ASCII")
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    val w = u16(payload, 6)
    val h = u16(payload, 8)
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
        w.toLong * h > MaxArea) return None
    val packed = payload(10) & 0xff
    val bgIndex = payload(11) & 0xff
    var pos = 13
    // global color table → 256-entry luma lookup (None if absent)
    val gct: Option[Array[Byte]] =
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        if (pos + 3 * n > payload.length) return None
        val t = lumaTable(payload, pos, n)
        pos += 3 * n
        Some(t)
      } else None

    val bgLuma: Byte = gct.map(t => t(bgIndex)).getOrElse(0)
    val canvas = Array.fill[Byte](w * h)(bgLuma)
    val frames = Seq.newBuilder[Array[Byte]]
    var nFrames = 0
    // graphic-control state for the NEXT image block
    var transparent = -1
    var disposal = 0

    while (pos < payload.length) {
      (payload(pos) & 0xff) match {
        case 0x3b => // trailer
          val fs = frames.result()
          return if (fs.isEmpty) None else Some((w, h, fs))

        case 0x21 => // extension: label, then sub-blocks
          if (pos + 2 > payload.length) return None
          val label = payload(pos + 1) & 0xff
          pos += 2
          if (label == 0xf9) { // graphic control
            if (pos + 6 > payload.length || (payload(pos) & 0xff) != 4)
              return None
            val gp = payload(pos + 1) & 0xff
            disposal = (gp >> 2) & 7
            transparent =
              if ((gp & 1) != 0) payload(pos + 4) & 0xff else -1
            pos += 5 // size byte + 4 data bytes; terminator consumed below
          }
          pos = skipSubBlocks(payload, pos).getOrElse(return None)

        case 0x2c => // image descriptor
          if (pos + 10 > payload.length) return None
          val left = u16(payload, pos + 1)
          val top = u16(payload, pos + 3)
          val iw = u16(payload, pos + 5)
          val ih = u16(payload, pos + 7)
          val ip = payload(pos + 9) & 0xff
          pos += 10
          if (iw <= 0 || ih <= 0 || left + iw > w || top + ih > h)
            return None
          val interlaced = (ip & 0x40) != 0
          val lct: Option[Array[Byte]] =
            if ((ip & 0x80) != 0) {
              val n = 2 << (ip & 7)
              if (pos + 3 * n > payload.length) return None
              val t = lumaTable(payload, pos, n)
              pos += 3 * n
              Some(t)
            } else None
          val table = lct.orElse(gct).getOrElse(return None)
          if (pos >= payload.length) return None
          val mcs = payload(pos) & 0xff
          pos += 1
          if (mcs < 2 || mcs > 8) return None
          val (indices, next) =
            lzwDecode(payload, pos, mcs, iw * ih).getOrElse(return None)
          pos = next
          // composite: disposal-3 restores the pre-draw canvas afterwards
          val saved =
            if (disposal == 3) canvas.clone() else null
          var y = 0
          while (y < ih) {
            val cy = top + deinterlaceRow(y, ih, interlaced)
            var x = 0
            while (x < iw) {
              val idx = indices(y * iw + x) & 0xff
              if (idx != transparent)
                canvas((cy * w) + left + x) = table(idx)
              x += 1
            }
            y += 1
          }
          nFrames += 1
          if (nFrames > MaxFrames) return None
          frames += canvas.clone()
          disposal match {
            case 2 => // restore to background within the frame rect
              var ry = top
              while (ry < top + ih) {
                java.util.Arrays.fill(canvas, ry * w + left,
                  ry * w + left + iw, bgLuma)
                ry += 1
              }
            case 3 => System.arraycopy(saved, 0, canvas, 0, saved.length)
            case _ => ()
          }
          transparent = -1
          disposal = 0

        case _ => return None
      }
    }
    None // ran off the end without a trailer
  }

  /** 16-bin luma histogram over composited frames — identical binning to
    * VideoCodec.lumaHistogram (shared feature convention). */
  def lumaHistogram(lumaPlanes: Seq[Array[Byte]]): Array[Float] =
    VideoCodec.lumaHistogram(lumaPlanes)

  private def u16(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)

  /** RGB color table at `off` (n entries) → 256-byte luma lookup; indices
    * past the table end map to 0 (decoders conventionally clamp — a
    * stream may reference indices outside a short table). */
  private def lumaTable(p: Array[Byte], off: Int, n: Int): Array[Byte] = {
    val t = new Array[Byte](256)
    var i = 0
    while (i < n) {
      val r = p(off + 3 * i) & 0xff
      val g = p(off + 3 * i + 1) & 0xff
      val b = p(off + 3 * i + 2) & 0xff
      t(i) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
      i += 1
    }
    t
  }

  /** Source row for output row `y` of an `ih`-row image under GIF's
    * four-pass interlace (rows 0,8,.. then 4,12,.. then 2,6,.. then
    * 1,3,..): returns the CANVAS row that the y-th DECODED row lands on.
    */
  private def deinterlaceRow(y: Int, ih: Int, interlaced: Boolean): Int = {
    if (!interlaced) return y
    val p1 = (ih + 7) / 8 // rows in pass 1 (start 0, step 8)
    val p2 = (ih + 3) / 8 // pass 2 (start 4, step 8)
    val p3 = (ih + 1) / 4 // pass 3 (start 2, step 4)
    if (y < p1) y * 8
    else if (y < p1 + p2) 4 + (y - p1) * 8
    else if (y < p1 + p2 + p3) 2 + (y - p1 - p2) * 4
    else 1 + (y - p1 - p2 - p3) * 2
  }

  /** Skip (or end) a chain of data sub-blocks starting at `pos`; returns
    * the position after the 0x00 terminator. */
  private def skipSubBlocks(p: Array[Byte], pos0: Int): Option[Int] = {
    var pos = pos0
    while (pos < p.length) {
      val n = p(pos) & 0xff
      if (n == 0) return Some(pos + 1)
      pos += 1 + n
    }
    None
  }

  /** Variable-width LSB-first GIF-LZW decode of the sub-block chain at
    * `pos`, expecting exactly `need` pixels. Returns (indices, position
    * after the sub-block terminator). Strict: under-produced pixel count,
    * codes past the dictionary frontier, oversized code widths, or a
    * missing terminator are all None. Extra codes after `need` pixels are
    * tolerated up to EOI/terminator (encoders may pad). */
  private def lzwDecode(p: Array[Byte], pos0: Int, mcs: Int,
      need: Int): Option[(Array[Byte], Int)] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var li = 0
    while (li < clear) { suffix(li) = li.toByte; li += 1 } // literal roots
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](need)
    var outN = 0
    var codeSize = mcs + 1
    var nextCode = eoi + 1
    var prev = -1
    var bits = 0
    var acc = 0L
    var pos = pos0
    var blockLeft = 0 // bytes remaining in the current sub-block

    def firstByte(code0: Int): Byte = {
      var c = code0
      while (c >= clear) c = prefix(c)
      suffix(c)
    }

    while (true) {
      // refill the bit accumulator
      while (bits < codeSize) {
        if (blockLeft == 0) {
          if (pos >= p.length) return None
          blockLeft = p(pos) & 0xff
          pos += 1
          if (blockLeft == 0) {
            // terminator: accept iff the image is complete
            return if (outN == need) Some((out, pos)) else None
          }
        }
        if (pos >= p.length) return None
        acc |= (p(pos) & 0xffL) << bits
        bits += 8
        pos += 1
        blockLeft -= 1
      }
      val code = (acc & ((1 << codeSize) - 1)).toInt
      acc >>>= codeSize
      bits -= codeSize

      if (code == clear) {
        codeSize = mcs + 1
        nextCode = eoi + 1
        prev = -1
      } else if (code == eoi) {
        if (outN != need) return None
        // consume through the 0x00 sub-block terminator
        pos += blockLeft
        return skipSubBlocks(p, pos).map(end => (out, end))
      } else {
        if (code > nextCode || (code == nextCode && prev < 0)) return None
        if (prev < 0) {
          // first code after clear must be a literal
          if (code >= clear) return None
          if (outN < need) { out(outN) = code.toByte; outN += 1 }
        } else {
          var sp = 0
          var c = code
          if (code == nextCode) { // KwKwK
            stack(sp) = firstByte(prev); sp += 1
            c = prev
          }
          while (c >= clear) {
            if (sp >= stack.length) return None
            stack(sp) = suffix(c); sp += 1
            c = prefix(c)
          }
          stack(sp) = suffix(c); sp += 1
          while (sp > 0) {
            sp -= 1
            if (outN < need) { out(outN) = stack(sp); outN += 1 }
          }
          if (nextCode < 4096) {
            prefix(nextCode) = prev
            suffix(nextCode) = firstByte(code)
            nextCode += 1
            if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
        }
        prev = code
      }
    }
    None // unreachable
  }
}
