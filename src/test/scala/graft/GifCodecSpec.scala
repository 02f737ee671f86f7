package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{GifCodec, Multimodal, VideoCodec}

/** GIF87a/89a decode: round-trips against an independent LZW encoder
  * written here in the test (variable-width early-change convention, as
  * GIFCOMPR.C), covering dictionary growth across code widths, KwKwK
  * (same-color runs), interlace, transparency, disposal 1/2/3, local
  * color tables, and the hostile-input contract (None, never throw). */
class GifCodecSpec extends AnyFunSuite {

  // ===== independent GIF encoder (test-only) =====

  private def u16le(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** GIF-variant LZW encode with the standard early width change: the
    * width check runs after each emit, before the add that follows it. */
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

  private def subBlocks(data: Array[Byte]): Array[Byte] = {
    val out = Array.newBuilder[Byte]
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out += n.toByte
      out ++= data.slice(off, off + n)
      off += n
    }
    out += 0.toByte
    out.result()
  }

  /** Mirrors GIF's four-pass interlace: stored row j comes from natural
    * row of the j-th row in pass order 0,8,.. 4,12,.. 2,6,.. 1,3,.. */
  private def interlaceSourceRow(j: Int, ih: Int): Int = {
    val order = (0 until ih by 8) ++ (4 until ih by 8) ++
      (2 until ih by 4) ++ (1 until ih by 2)
    order(j)
  }

  case class Frame(left: Int, top: Int, iw: Int, ih: Int,
      indices: Array[Byte], interlaced: Boolean = false,
      transparent: Int = -1, disposal: Int = 0,
      localPal: Option[Array[(Int, Int, Int)]] = None,
      gce: Boolean = true)

  private def encodeGif(w: Int, h: Int, pal: Array[(Int, Int, Int)],
      frames: Seq[Frame], ver: String = "GIF89a",
      bgIndex: Int = 0): Array[Byte] = {
    def palBits(n: Int): Int = {
      var b = 0; while ((2 << b) < n) b += 1; b
    }
    val out = Array.newBuilder[Byte]
    out ++= ver.getBytes("US-ASCII")
    out ++= u16le(w); out ++= u16le(h)
    val gb = palBits(pal.length)
    out += (0x80 | (gb << 4) | gb).toByte // GCT present, size bits
    out += bgIndex.toByte
    out += 0.toByte // aspect
    val gctN = 2 << gb
    for (i <- 0 until gctN) {
      val (r, g, b) = if (i < pal.length) pal(i) else (0, 0, 0)
      out += r.toByte; out += g.toByte; out += b.toByte
    }
    for (f <- frames) {
      if (f.gce) {
        out += 0x21.toByte; out += 0xf9.toByte; out += 4.toByte
        val flag = ((f.disposal & 7) << 2) |
          (if (f.transparent >= 0) 1 else 0)
        out += flag.toByte
        out ++= u16le(3) // delay
        out += (if (f.transparent >= 0) f.transparent else 0).toByte
        out += 0.toByte // terminator
      }
      out += 0x2c.toByte
      out ++= u16le(f.left); out ++= u16le(f.top)
      out ++= u16le(f.iw); out ++= u16le(f.ih)
      f.localPal match {
        case Some(lp) =>
          val lb = palBits(lp.length)
          out += (0x80 | (if (f.interlaced) 0x40 else 0) | lb).toByte
          val n = 2 << lb
          for (i <- 0 until n) {
            val (r, g, b) = if (i < lp.length) lp(i) else (0, 0, 0)
            out += r.toByte; out += g.toByte; out += b.toByte
          }
        case None =>
          out += (if (f.interlaced) 0x40 else 0).toByte
      }
      val stored =
        if (!f.interlaced) f.indices
        else Array.tabulate(f.iw * f.ih) { i =>
          val j = i / f.iw
          f.indices(interlaceSourceRow(j, f.ih) * f.iw + (i % f.iw))
        }
      val nColors = f.localPal.map(_.length).getOrElse(pal.length)
      val mcs = math.max(2, palBits(nColors) + 1)
      out += mcs.toByte
      out ++= subBlocks(lzwEncode(stored, mcs))
    }
    out += 0x3b.toByte
    out.result()
  }

  private def luma(rgb: (Int, Int, Int)): Byte =
    ((rgb._1 * 299 + rgb._2 * 587 + rgb._3 * 114) / 1000).toByte

  private val pal8: Array[(Int, Int, Int)] = Array(
    (0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 255, 0),
    (0, 0, 255), (128, 64, 32), (7, 77, 177), (200, 150, 100))

  // ===== tests =====

  test("round-trip: odd-size frame, 8-color palette, dictionary growth") {
    val (w, h) = (37, 23)
    val idx = Array.tabulate(w * h)(i => ((i * 31 + i / w * 7) % 8).toByte)
    val enc = encodeGif(w, h, pal8, Seq(Frame(0, 0, w, h, idx)))
    val Some((gw, gh, planes)) = GifCodec.decode(enc)
    assert(gw == w && gh == h && planes.length == 1)
    val expect = idx.map(i => luma(pal8(i & 0xff)))
    assert(planes.head.sameElements(expect))
    // GIF87a header also accepted; frame without a GCE block too
    val enc87 = encodeGif(w, h, pal8,
      Seq(Frame(0, 0, w, h, idx, gce = false)), ver = "GIF87a")
    assert(GifCodec.decode(enc87).map(_._3.head.toSeq) ==
      Some(expect.toSeq))
  }

  test("round-trip: same-color runs exercise KwKwK codes") {
    val (w, h) = (64, 9)
    // long single-color runs force code==nextCode at decode
    val idx = Array.tabulate(w * h)(i => ((i / 97) % 8).toByte)
    val Some((_, _, planes)) =
      GifCodec.decode(encodeGif(w, h, pal8, Seq(Frame(0, 0, w, h, idx))))
    assert(planes.head.sameElements(idx.map(i => luma(pal8(i & 0xff)))))
  }

  test("round-trip: wide dictionary crosses several code widths") {
    val (w, h) = (101, 53) // 5353 px, enough entries to pass width 9→10
    val rnd = new scala.util.Random(42)
    val idx = Array.fill(w * h)(rnd.nextInt(8).toByte)
    val Some((_, _, planes)) =
      GifCodec.decode(encodeGif(w, h, pal8, Seq(Frame(0, 0, w, h, idx))))
    assert(planes.head.sameElements(idx.map(i => luma(pal8(i & 0xff)))))
  }

  test("interlaced frame decodes to the same plane as sequential") {
    val (w, h) = (13, 11)
    val idx = Array.tabulate(w * h)(i => ((i * 5 + 3) % 8).toByte)
    val seqPlane = GifCodec.decode(
      encodeGif(w, h, pal8, Seq(Frame(0, 0, w, h, idx)))).get._3.head
    val intPlane = GifCodec.decode(
      encodeGif(w, h, pal8,
        Seq(Frame(0, 0, w, h, idx, interlaced = true)))).get._3.head
    assert(intPlane.sameElements(seqPlane))
  }

  test("compositing: transparency + disposal none/background/previous") {
    val (w, h) = (8, 8)
    val full = Array.fill(w * h)(1.toByte) // white background frame
    // frame 2: 4x4 red patch at (2,2), disposal 3 (restore previous)
    val patch = Array.fill(16)(2.toByte)
    // frame 3: 2x2 with transparent index 3 over green
    val trans = Array[Byte](3, 4, 4, 3)
    val enc = encodeGif(w, h, pal8, Seq(
      Frame(0, 0, w, h, full, disposal = 1),
      Frame(2, 2, 4, 4, patch, disposal = 3),
      Frame(0, 0, 2, 2, trans, transparent = 3, disposal = 2)))
    val Some((_, _, planes)) = GifCodec.decode(enc)
    assert(planes.length == 3)
    val whi = luma(pal8(1)); val red = luma(pal8(2)); val blu = luma(pal8(4))
    assert(planes(0).forall(_ == whi))
    // frame 2: red patch composited over white
    assert(planes(1)(2 * w + 2) == red && planes(1)(0) == whi)
    assert(planes(1)(5 * w + 5) == red && planes(1)(6 * w + 6) == whi)
    // frame 3: disposal-3 restored white; transparent pixels show white
    assert(planes(2)(2 * w + 2) == whi, "disposal 3 restored previous")
    assert(planes(2)(0) == whi, "transparent index left canvas pixel")
    assert(planes(2)(1) == blu && planes(2)(w) == blu)
  }

  test("local color table overrides global") {
    val lp: Array[(Int, Int, Int)] =
      Array((10, 20, 30), (250, 240, 230), (5, 5, 5), (9, 9, 9))
    val idx = Array[Byte](0, 1, 2, 3)
    val enc = encodeGif(2, 2, pal8,
      Seq(Frame(0, 0, 2, 2, idx, localPal = Some(lp))))
    val Some((_, _, planes)) = GifCodec.decode(enc)
    assert(planes.head.sameElements(idx.map(i => luma(lp(i & 0xff)))))
  }

  test("hostile inputs: None, never throw") {
    val (w, h) = (9, 7)
    val idx = Array.tabulate(w * h)(i => (i % 8).toByte)
    val good = encodeGif(w, h, pal8, Seq(Frame(0, 0, w, h, idx)))
    assert(GifCodec.decode(null).isEmpty)
    assert(GifCodec.decode(Array[Byte]()).isEmpty)
    assert(GifCodec.decode("GIF90a".getBytes ++ good.drop(6)).isEmpty)
    assert(GifCodec.decode(good.dropRight(1)).isEmpty, "missing trailer")
    for (cut <- Seq(7, 12, 14, 20, good.length / 2))
      assert(GifCodec.decode(good.take(cut)).isEmpty, s"truncated @$cut")
    // oversized logical screen
    val big = good.clone()
    big(6) = 0xff.toByte; big(7) = 0xff.toByte
    big(8) = 0xff.toByte; big(9) = 0xff.toByte
    assert(GifCodec.decode(big).isEmpty)
    // frame rect outside the logical screen
    assert(GifCodec.decode(
      encodeGif(4, 4, pal8, Seq(Frame(2, 2, 4, 4, idx.take(16))))).isEmpty)
    // code past the dictionary frontier: mcs=2, first code = 7 (> eoi+1)
    val badLzw = ("GIF89a".getBytes
      ++ u16le(2) ++ u16le(2) ++ Array[Byte](0x80.toByte, 0, 0)
      ++ Array.fill(2 << 0)(Array[Byte](1, 2, 3)).flatten // 2-entry GCT
      ++ Array[Byte](0x2c, 0, 0, 0, 0) ++ u16le(2) ++ u16le(2)
      ++ Array[Byte](0, 2) // no LCT, mcs=2
      ++ Array[Byte](2, 0x3c.toByte, 0x00, 0) // codes: clear(4), 7
      ++ Array[Byte](0x3b))
    assert(GifCodec.decode(badLzw).isEmpty)
    // under-produced pixels: EOI after a single literal for a 2x2 frame
    val short = ("GIF89a".getBytes
      ++ u16le(2) ++ u16le(2) ++ Array[Byte](0x80.toByte, 0, 0)
      ++ Array.fill(2)(Array[Byte](1, 2, 3)).flatten
      ++ Array[Byte](0x2c, 0, 0, 0, 0) ++ u16le(2) ++ u16le(2)
      ++ Array[Byte](0, 2)
      ++ Array[Byte](2, 0x04.toByte, 0x05, 0) // clear(4), 0, then eoi(5)
      ++ Array[Byte](0x3b))
    assert(GifCodec.decode(short).isEmpty)
  }

  test("main-tree encoder (q19 synthesis path) round-trips through decode") {
    val gifPal = Array.tabulate(8)(k =>
      ((k * 37 + 11) % 256, (k * 53 + 23) % 256, (k * 29 + 5) % 256))
    for ((id, w, h, nf) <- Seq((25L, 9, 7, 4), (26L, 13, 5, 3))) {
      val frames = (0 until nf).map { f =>
        Array.tabulate(w * h)(i => ((i * 3 + f * 5 + id) % 8).toByte)
      }
      val enc = GifCodec.encode(w, h, gifPal, frames)
      val Some((gw, gh, planes)) = GifCodec.decode(enc)
      assert(gw == w && gh == h && planes.length == nf)
      for (f <- 0 until nf)
        assert(planes(f).sameElements(
          frames(f).map(i => luma(gifPal(i & 0xff)))), s"id=$id frame=$f")
    }
  }

  test("multimodal video path: GIF decodes for real (features + frames)") {
    val (w, h) = (16, 12)
    val f1 = Array.fill(w * h)(1.toByte)
    val f2 = Array.tabulate(w * h)(i => (i % 8).toByte)
    val enc = encodeGif(w, h, pal8,
      Seq(Frame(0, 0, w, h, f1), Frame(0, 0, w, h, f2)))
    val direct = GifCodec.decode(enc).get._3
    val hist = VideoCodec.lumaHistogram(direct)
    val viaOp = Multimodal.decodeFeatures("video", enc)
    assert(viaOp.sameElements(hist))
    assert(math.abs(hist.sum - 1.0f) < 1e-5)
    // unknown compressed codec still falls to the declared stub
    val h264ish = Array[Byte](0, 0, 0, 1, 0x67, 42, 42, 42)
    assert(Multimodal.decodeFeatures("video", h264ish)
      .sameElements(Multimodal.fakeDecodeFeatures(h264ish)))
  }
}
