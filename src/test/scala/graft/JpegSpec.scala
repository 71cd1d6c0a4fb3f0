package graft

import graft.operators.Jpeg
import graft.operators.Jpeg.{JpegBytes, JpegPixelDecoder, JpegStats}
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the baseline JPEG decoder: a generative sweep against
  * an independent scalar model (all four payload variants, restart
  * resets, AC cosine terms), a HANDCRAFTED single-MCU file whose custom
  * canonical huffman table forces a stuffed 0xFF scan byte (the
  * generative payloads never produce one, so the unstuffing path needs
  * its own pin), and malformed-degradation cases. */
class JpegSpec extends AnyFunSuite {

  private val c0 = Jpeg.InvSqrt2
  private def cos1(x: Int) = Jpeg.CosT(x)(1)

  /** Independent scalar model of the decode result — the oracle's
    * closed form, recomputed here in Scala (third implementation). */
  private def expected(id: Long): Option[JpegStats] = (id % 4) match {
    case 2 | 3 => None
    case _ =>
      val (wB, hB) = (JpegBytes.wBlocks(id), JpegBytes.hBlocks(id))
      var (sr, sg, sb, yl) = (0L, 0L, 0L, 0L)
      def clampD(d: Double): Double = math.max(0.0, math.min(255.0, d))
      def clampL(l: Long): Long = math.max(0L, math.min(255L, l))
      for (by <- 0 until hB; bx <- 0 until wB; x <- 0 until 8) {
        val fdy = (JpegBytes.dcY(id, bx, by) * JpegBytes.qLum(0)).toDouble
        val fay = (JpegBytes.acY(id, bx, by) * JpegBytes.qLum(1)).toDouble
        val fcb = (JpegBytes.dcCb(id, bx, by) * JpegBytes.qChr(0)).toDouble
        val fcr = (JpegBytes.dcCr(id, bx, by) * JpegBytes.qChr(0)).toDouble
        val ys = clampD(math.floor(
          0.25 * ((c0 * c0) * fdy + (c0 * fay) * cos1(x)) + 128.0 + 0.5))
        val cb = clampD(math.floor(0.25 * ((c0 * c0) * fcb) + 128.0 + 0.5))
        val cr = clampD(math.floor(0.25 * ((c0 * c0) * fcr) + 128.0 + 0.5))
        val r = clampL(math.floor(ys + 1.402 * (cr - 128.0) + 0.5).toLong)
        val g = clampL(math.floor(
          ys - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5).toLong)
        val b = clampL(math.floor(ys + 1.772 * (cb - 128.0) + 0.5).toLong)
        sr += 8 * r; sg += 8 * g; sb += 8 * b
        yl += (64L * by + 28L) * (r + g + b)
      }
      Some(JpegStats(8L * wB, 8L * hB, 64L * wB * hB, (wB * hB).toLong,
        sr, sg, sb, yl))
  }

  test("generative sweep: decode equals the independent scalar model for 240 ids") {
    (0L until 240L).foreach { id =>
      val got = JpegPixelDecoder.decode(JpegBytes.payload(id, s"doc$id"))
      assert(got == expected(id), s"id=$id (variant ${id % 4})")
    }
    // the sweep genuinely exercises restarts: variant-1 payloads with
    // multiple MCU rows contain RSTn markers
    val withRst = (0L until 240L).filter(id => id % 4 == 1 &&
      JpegBytes.hBlocks(id) > 1)
    assert(withRst.nonEmpty, "no restart-marker payloads in the sweep")
  }

  // ---- handcrafted single-MCU file with a FORCED stuffed byte ----

  private class BitWriter {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def bits(v: Int, len: Int): Unit = (len - 1 to 0 by -1).foreach { i =>
      acc = (acc << 1) | ((v >> i) & 1); n += 1
      if (n == 8) { out.write(acc); if (acc == 0xFF) out.write(0); acc = 0; n = 0 }
    }
    def flush(): Unit = if (n > 0) {
      acc = (acc << (8 - n)) | ((1 << (8 - n)) - 1)
      out.write(acc); if (acc == 0xFF) out.write(0); acc = 0; n = 0
    }
  }

  private def seg(m: Int, p: Array[Int]): Array[Byte] =
    (Array(0xFF, m, (p.length + 2) >> 8, (p.length + 2) & 0xFF) ++ p)
      .map(_.toByte)

  /** 8x8 gray MCU whose DC table is a depth-skewed canonical code
    * (BITS = one code per length), so the size-8 DC symbol's 9-bit code
    * 111111110 plus an all-ones extend byte-aligns to a raw 0xFF at
    * scan start — the encoder must stuff it, the decoder must unstuff. */
  private def handcrafted(): Array[Byte] = {
    val soi = Array(0xFF, 0xD8).map(_.toByte)
    val eoi = Array(0xFF, 0xD9).map(_.toByte)
    val dqt = seg(0xDB, Array(0x00) ++ Array.fill(64)(8))
    val sof = seg(0xC0, Array(8, 0, 8, 0, 8, 3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0))
    // DC table 0: one symbol per code length 1..9, vals = sizes 0..8
    val dcBits = Array(1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    val dcVals = (0 to 8).toArray
    // AC table 0: the engine's 5-bit table shape
    val acBits = Array(0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val acVals = Array(0x00) ++ (1 to 10) ++ Array(0xF0)
    val dht = seg(0xC4,
      Array(0x00) ++ dcBits ++ dcVals ++ Array(0x10) ++ acBits ++ acVals)
    val sos = seg(0xDA, Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0))
    val w = new BitWriter
    // Y: DC size 8 (depth-9 code 111111110), extend 255 = 11111111,
    // then EOB (code 0, 5 bits). First 8 bits are all ones -> 0xFF.
    w.bits(0x1FE, 9); w.bits(0xFF, 8); w.bits(0, 5)
    // Cb, Cr: DC size 0 (depth-1 code 0), EOB
    w.bits(0, 1); w.bits(0, 5)
    w.bits(0, 1); w.bits(0, 5)
    w.flush()
    soi ++ dqt ++ sof ++ dht ++ sos ++ w.out.toByteArray ++ eoi
  }

  test("handcrafted MCU: stuffed 0xFF decodes; DC 255 saturates to white") {
    val bytes = handcrafted()
    // the scan really contains a stuffed byte
    val scanStart = (0 until bytes.length - 1).indexWhere(i =>
      (bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) == 0xDA) + 2
    val scan = bytes.slice(scanStart, bytes.length - 2)
    assert(scan.sliding(2).exists(a =>
      (a(0) & 0xFF) == 0xFF && (a(1) & 0xFF) == 0x00),
      "handcrafted scan lost its stuffed byte")
    // Y = clamp(floor(0.25*(c0*c0*255*8) + 128.5)) = 255 (saturated),
    // chroma neutral -> pure white
    val got = JpegPixelDecoder.decode(bytes)
    assert(got == Some(JpegStats(8, 8, 64, 1,
      255L * 64, 255L * 64, 255L * 64, 765L * 8 * 28)), s"got $got")
  }

  /** Independent scalar model of the 4:2:0 decode result. */
  private def expected420(id: Long): Option[JpegStats] = (id % 3) match {
    case 2 => None
    case _ =>
      val wm = JpegBytes.wMcus420(id)
      var (sr, sg, sb, yl) = (0L, 0L, 0L, 0L)
      def clampD(d: Double): Double = math.max(0.0, math.min(255.0, d))
      def clampL(l: Long): Long = math.max(0L, math.min(255L, l))
      for (mx <- 0 until wm; yy <- 0 until 2; x <- 0 until 16) {
        val fdy = (JpegBytes.dcY420(id, mx, 2 * yy + x / 8)
          * JpegBytes.qLum(0)).toDouble
        val fcb = (JpegBytes.dcCb420(id, mx) * JpegBytes.qChr(0)).toDouble
        val fcba = (JpegBytes.acCb420(id, mx) * JpegBytes.qChr(1)).toDouble
        val fcr = (JpegBytes.dcCr420(id, mx) * JpegBytes.qChr(0)).toDouble
        val ys = clampD(math.floor(0.25 * ((c0 * c0) * fdy) + 128.0 + 0.5))
        val cb = clampD(math.floor(
          0.25 * ((c0 * c0) * fcb + (c0 * fcba) * cos1(x / 2)) + 128.0 + 0.5))
        val cr = clampD(math.floor(0.25 * ((c0 * c0) * fcr) + 128.0 + 0.5))
        val r = clampL(math.floor(ys + 1.402 * (cr - 128.0) + 0.5).toLong)
        val g = clampL(math.floor(
          ys - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5).toLong)
        val b = clampL(math.floor(ys + 1.772 * (cb - 128.0) + 0.5).toLong)
        sr += 8 * r; sg += 8 * g; sb += 8 * b
        yl += (64L * yy + 28L) * (r + g + b)
      }
      Some(JpegStats(16L * wm, 16L, 256L * wm, wm.toLong, sr, sg, sb, yl))
  }

  test("4:2:0 sweep: multi-block MCUs, chroma upsampling, intra-MCU restarts") {
    (0L until 240L).foreach { id =>
      val got = JpegPixelDecoder.decode(JpegBytes.payload420(id, s"doc$id"))
      assert(got == expected420(id), s"id=$id (variant ${id % 3})")
    }
    // the upsampling really is gated: some doc has a nonzero chroma AC
    assert((0L until 240L).exists(id => id % 3 <= 1 &&
      (0 until JpegBytes.wMcus420(id)).exists(JpegBytes.acCb420(id, _) != 0)))
    // and the restart variant includes two-MCU images (a real RSTn)
    assert((0L until 240L).exists(id => id % 3 == 1 && JpegBytes.wMcus420(id) == 2))
  }

  /** Independent scalar model of the edge-clipped decode result. */
  private def expectedEdge(id: Long): Option[JpegStats] = (id % 3) match {
    case 2 => None
    case _ =>
      val (wB, hB) = (JpegBytes.wBlocks(id), JpegBytes.hBlocks(id))
      val (tw, th) = (JpegBytes.widthE(id), JpegBytes.heightE(id))
      var (sr, sg, sb, yl) = (0L, 0L, 0L, 0L)
      def clampD(d: Double): Double = math.max(0.0, math.min(255.0, d))
      def clampL(l: Long): Long = math.max(0L, math.min(255L, l))
      for (by <- 0 until hB; bx <- 0 until wB; x <- 0 until 8
           if 8 * bx + x < tw) {
        val fdy = (JpegBytes.dcY(id, bx, by) * JpegBytes.qLum(0)).toDouble
        val fay = (JpegBytes.acY(id, bx, by) * JpegBytes.qLum(1)).toDouble
        val fcb = (JpegBytes.dcCb(id, bx, by) * JpegBytes.qChr(0)).toDouble
        val fcr = (JpegBytes.dcCr(id, bx, by) * JpegBytes.qChr(0)).toDouble
        val ys = clampD(math.floor(
          0.25 * ((c0 * c0) * fdy + (c0 * fay) * cos1(x)) + 128.0 + 0.5))
        val cb = clampD(math.floor(0.25 * ((c0 * c0) * fcb) + 128.0 + 0.5))
        val cr = clampD(math.floor(0.25 * ((c0 * c0) * fcr) + 128.0 + 0.5))
        val r = clampL(math.floor(ys + 1.402 * (cr - 128.0) + 0.5).toLong)
        val g = clampL(math.floor(
          ys - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5).toLong)
        val b = clampL(math.floor(ys + 1.772 * (cb - 128.0) + 0.5).toLong)
        val rc = math.min(8L, th - 8L * by)
        sr += rc * r; sg += rc * g; sb += rc * b
        yl += (rc * 8L * by + rc * (rc - 1) / 2) * (r + g + b)
      }
      Some(JpegStats(tw, th, tw * th, (wB * hB).toLong, sr, sg, sb, yl))
  }

  test("edge-clipped sweep: full-MCU entropy stream, declared-dims clipping") {
    (0L until 240L).foreach { id =>
      val got = JpegPixelDecoder.decode(JpegBytes.payloadEdge(id, s"doc$id"))
      assert(got == expectedEdge(id), s"id=$id (variant ${id % 3})")
    }
    // the sweep genuinely clips: some doc loses columns AND rows
    assert((0L until 240L).exists(id => id % 3 <= 1 &&
      JpegBytes.widthE(id) % 8 != 0 && JpegBytes.heightE(id) % 8 != 0))
  }

  test("malformed payloads degrade to None, never throw") {
    val good = JpegBytes.payload(0L, "x")
    assert(JpegPixelDecoder.decode(good).isDefined)
    // a baseline stream re-labeled SOF2: its scan header (Ss=0, Se=63)
    // is invalid as a progressive scan — fails closed, never garbles
    val sofAt = (0 until good.length - 1).indexWhere(i =>
      (good(i) & 0xFF) == 0xFF && (good(i + 1) & 0xFF) == 0xC0)
    val progressive = good.clone(); progressive(sofAt + 1) = 0xC2.toByte
    assert(JpegPixelDecoder.decode(progressive).isEmpty)
    // non-4:4:4 sampling declared: decoder refuses rather than garbling
    val subsampled = good.clone()
    subsampled(sofAt + 11) = 0x22.toByte // Y sampling factor
    assert(JpegPixelDecoder.decode(subsampled).isEmpty)
    // header truncation and garbage
    assert(JpegPixelDecoder.decode(good.take(6)).isEmpty)
    assert(JpegPixelDecoder.decode(Array[Byte](1, 2, 3)).isEmpty)
    // truncated entropy stream (the generative variant 2)
    assert(JpegPixelDecoder.decode(JpegBytes.payload(2L, "x")).isEmpty)
    // opaque payload (variant 3)
    assert(JpegPixelDecoder.decode(JpegBytes.payload(3L, "x")).isEmpty)
    // unsupported sampling layout (2x1) declared in a 4:2:0 frame
    val g420 = JpegBytes.payload420(0L, "x")
    assert(JpegPixelDecoder.decode(g420).isDefined)
    val sof420At = (0 until g420.length - 1).indexWhere(i =>
      (g420(i) & 0xFF) == 0xFF && (g420(i + 1) & 0xFF) == 0xC0)
    val bad = g420.clone(); bad(sof420At + 11) = 0x21.toByte
    assert(JpegPixelDecoder.decode(bad).isEmpty)
    // truncated 4:2:0 entropy stream
    assert(JpegPixelDecoder.decode(g420.take(g420.length - 8)).isEmpty)
  }

  test("progressive sweep: multi-scan decode is bit-identical to baseline for 240 ids") {
    // the construction reuses q119's per-block coefficients, split by
    // bit plane (variant 0: Al=1 first passes + DC/AC refinements) or
    // by spectrum (variant 1: AC bands [1,1] + the all-empty [2,63] —
    // long cross-block EOB runs); a fully standard-compliant
    // progressive decode must therefore reproduce the BASELINE image
    // exactly, including the fail-closed variants (2: truncated scan,
    // 3: opaque bytes)
    (0L until 240L).foreach { id =>
      val prog = JpegPixelDecoder.decode(JpegBytes.payloadProg(id, s"doc$id"))
      val base = JpegPixelDecoder.decode(JpegBytes.payload(id, s"doc$id"))
      assert(prog == base,
        s"id=$id (variant ${id % 4}): progressive=$prog baseline=$base")
    }
    // the sweep exercises real refinement: some id has |acY| == 1 (a
    // coefficient INVISIBLE at Al=1 that the refinement scan must
    // newly set) and some has |acY| >= 2 (a correction bit)
    def ay(id: Long) = JpegBytes.acY(id, 0, 0)
    assert((0L until 240L by 4).exists(id => math.abs(ay(id)) == 1))
    assert((0L until 240L by 4).exists(id => math.abs(ay(id)) >= 2))
  }

  test("handcrafted progressive pin: single-block scans against the scalar closed form") {
    // id 12: wb = hb = 1 (single block), variant 0 (successive
    // approximation, four scans). The expected stats are recomputed
    // here as independent scalar math from the construction
    // coefficients — the q119 discipline, applied to the multi-scan
    // path specifically.
    val id = 12L
    val (dcY, acY, dcCb, dcCr) = (JpegBytes.dcY(id, 0, 0), JpegBytes.acY(id, 0, 0),
      JpegBytes.dcCb(id, 0, 0), JpegBytes.dcCr(id, 0, 0))
    val (fdy, fay) = (dcY * JpegBytes.qLum(0), acY * JpegBytes.qLum(1))
    val (fcb, fcr) = (dcCb * JpegBytes.qChr(0), dcCr * JpegBytes.qChr(0))
    val c0 = Jpeg.InvSqrt2
    def clamp(d: Double): Long = math.max(0.0, math.min(255.0, d)).toLong
    var (sr, sg, sb) = (0L, 0L, 0L)
    (0 until 8).foreach { x =>
      val ys = clamp(math.floor(
        0.25 * (c0 * c0 * fdy + (c0 * fay) * Jpeg.CosT(x)(1)) + 128.0 + 0.5))
        .toDouble
      val cbs = clamp(math.floor(0.25 * (c0 * c0 * fcb) + 128.0 + 0.5)).toDouble
      val crs = clamp(math.floor(0.25 * (c0 * c0 * fcr) + 128.0 + 0.5)).toDouble
      sr += clamp(math.floor(ys + 1.402 * (crs - 128.0) + 0.5))
      sg += clamp(math.floor(
        ys - 0.344136 * (cbs - 128.0) - 0.714136 * (crs - 128.0) + 0.5))
      sb += clamp(math.floor(ys + 1.772 * (cbs - 128.0) + 0.5))
    }
    val got = JpegPixelDecoder.decode(JpegBytes.payloadProg(id, "x"))
    assert(got.isDefined, "single-block progressive payload failed to decode")
    val st = got.get
    assert((st.w, st.h, st.nPx, st.nBlocks) == (8L, 8L, 64L, 1L))
    assert((st.sumR, st.sumG, st.sumB) == (8 * sr, 8 * sg, 8 * sb),
      s"channel sums diverged: got (${st.sumR},${st.sumG},${st.sumB}), " +
        s"want (${8 * sr},${8 * sg},${8 * sb})")
    assert(st.ysumLum == 28 * (sr + sg + sb), "y-moment diverged")
  }

  test("handcrafted ZRL pin: a 16-zero skip places the AC at zigzag 17 exactly") {
    // zigzag 17 is natural (u=3, v=2): sample(x, y) = 0.25 * (c0^2 * dcq
    // + acq * cos(x,3) * cos(y,2)) + 128 — the two-coefficient closed
    // form, computed here as independent scalar math. A ZRL that skips
    // 15 or 17 positions, or drops the coefficient, moves every sum.
    val (dc, ac17) = (-7, 5)
    val (dcq, acq) = (dc * JpegBytes.qLum(0), ac17 * JpegBytes.qLum(17))
    val c0 = Jpeg.InvSqrt2
    def cos(i: Int, f: Int) = Jpeg.CosT(i)(f)
    def clamp(d: Double): Long = math.max(0.0, math.min(255.0, d)).toLong
    var (sum, ymom) = (0L, 0L)
    (0 until 8).foreach { y =>
      (0 until 8).foreach { x =>
        val ys = clamp(math.floor(
          0.25 * (c0 * c0 * dcq + acq * cos(x, 3) * cos(y, 2)) + 128.0 + 0.5))
        // chroma DCs are zero -> cb = cr = 128 -> r = g = b = ys exactly
        val px = clamp(math.floor(ys.toDouble + 0.5))
        sum += px; ymom += y.toLong * 3L * px
      }
    }
    val got = JpegPixelDecoder.decode(JpegBytes.handcraftedProgZrl(dc, ac17))
    assert(got.isDefined, "handcrafted ZRL payload failed to decode")
    val st = got.get
    assert((st.w, st.h, st.nPx, st.nBlocks) == (8L, 8L, 64L, 1L))
    assert((st.sumR, st.sumG, st.sumB) == (sum, sum, sum),
      s"channel sums: got (${st.sumR},${st.sumG},${st.sumB}), want $sum")
    assert(st.ysumLum == ymom, s"y-moment: got ${st.ysumLum}, want $ymom")
  }

  test("malformed progressive payloads degrade to None") {
    // progressive + subsampling: unsupported layout, fail closed
    assert(JpegPixelDecoder.decode(JpegBytes.malformedProg("prog420")).isEmpty)
    // an AC scan with three components is invalid by T.81
    assert(JpegPixelDecoder.decode(JpegBytes.malformedProg("ac_interleaved")).isEmpty)
    // an AC refinement code with size 2 is invalid (only +-1 at Al)
    assert(JpegPixelDecoder.decode(JpegBytes.malformedProg("refine_size2")).isEmpty)
    // truncated mid-scan (the generative variant 2)
    assert(JpegPixelDecoder.decode(JpegBytes.payloadProg(2L, "x")).isEmpty)
  }
}
