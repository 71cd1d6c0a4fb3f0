package graft

import graft.operators.Binary
import org.scalatest.funsuite.AnyFunSuite

/** The image-header decoder's contract: it parses the REAL format
  * layouts (not the synthesizer's arithmetic) — pinned on handcrafted
  * byte arrays independent of [[Binary.ImageBytes]] — and degrades to
  * 'unknown' on anything it cannot parse, never throwing. */
class BinarySpec extends AnyFunSuite {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("decodes a handcrafted PNG IHDR: big-endian dims, color-type channel map") {
    // 640x480 grayscale+alpha (color type 4 -> 2 channels)
    val png = b(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80, // width 640
      0, 0, 0x01, 0xE0, // height 480
      8, 4, 0, 0, 0,
      0xDE, 0xAD, 0xBE, 0xEF) // CRC (unchecked)
    assert(Binary.decodeImageHeader(png) ==
      (("png", Some(640L), Some(480L), Some(2L))))
  }

  test("walks JPEG segments to a progressive SOF2 frame header") {
    // SOI, APP1 (Exif-style, 8 bytes), DQT-ish stub segment, SOF2
    val jpeg = b(0xFF, 0xD8,
      0xFF, 0xE1, 0x00, 0x08, 'E', 'x', 'i', 'f', 0, 0,
      0xFF, 0xDB, 0x00, 0x04, 0x11, 0x22,
      0xFF, 0xC2, 0x00, 0x0B, 8,
      0x01, 0x00, // height 256
      0x02, 0x00, // width 512
      1, 0x11, 0, 0)
    assert(Binary.decodeImageHeader(jpeg) ==
      (("jpeg", Some(512L), Some(256L), Some(1L))))
  }

  test("truncated, corrupt, and empty payloads degrade to unknown without throwing") {
    val cases = Seq(
      Array.emptyByteArray,
      b(0x89, 'P', 'N', 'G'), // truncated signature
      b(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A, 0, 0, 0, 13,
        'I', 'D', 'A', 'T', 0, 0, 0, 1, 0, 0, 0, 1, 8, 2), // first chunk not IHDR
      b(0xFF, 0xD8, 0xFF, 0xE0, 0x7F, 0xFF, 1, 2, 3), // segment len past EOF
      b(0xFF, 0xD8, 0x00, 0x11), // marker byte missing
      "plain text payload".getBytes("UTF-8"))
    cases.foreach { c =>
      val (fmt, w, h, ch) = Binary.decodeImageHeader(c)
      assert(fmt == "unknown" && w.isEmpty && h.isEmpty && ch.isEmpty,
        s"payload ${c.take(8).mkString(",")} decoded as $fmt")
    }
  }

  test("synthesized payloads round-trip: decode recovers the construction parameters") {
    Seq(0L, 1L, 2L, 33L, 34L, 35L, 999L, 1000L).foreach { id =>
      val (fmt, w, h, ch) =
        Binary.decodeImageHeader(Binary.ImageBytes.payload(id, "opaque text"))
      (id % 3) match {
        case 0 =>
          assert(fmt == "png" &&
            w.contains(Binary.ImageBytes.width(id)) &&
            h.contains(Binary.ImageBytes.height(id)) &&
            ch.contains(if (id % 2 == 0) 3L else 4L), s"id $id: $fmt $w $h $ch")
        case 1 =>
          assert(fmt == "jpeg" &&
            w.contains(Binary.ImageBytes.width(id)) &&
            h.contains(Binary.ImageBytes.height(id)) &&
            ch.contains(if (id % 2 == 0) 3L else 1L), s"id $id: $fmt $w $h $ch")
        case _ =>
          assert(fmt == "unknown" && w.isEmpty, s"id $id: $fmt $w $h $ch")
      }
    }
  }

  // ---- q105: WAV/RIFF decoder contract ----

  test("decodes a handcrafted canonical WAV: LE fields, frames and duration derived") {
    // 2ch 16-bit 8000 Hz, 4 frames (16 data bytes, align 4): 0.5 ms floors to 0
    val wav = b('R', 'I', 'F', 'F', 48, 0, 0, 0, 'W', 'A', 'V', 'E',
      'f', 'm', 't', ' ', 16, 0, 0, 0,
      1, 0, 2, 0, 0x40, 0x1F, 0, 0, 0, 0x7D, 0, 0, 4, 0, 16, 0,
      'd', 'a', 't', 'a', 16, 0, 0, 0) ++ Array.fill(16)(0.toByte)
    assert(Binary.decodeWavHeader(wav) ==
      (("wav", Some(2L), Some(8000L), Some(16L), Some(4L), Some(0L))))
  }

  test("walks an odd-sized unknown chunk with the spec pad byte before fmt") {
    // a 3-byte 'ABC ' chunk (padded to 4) precedes fmt; a reader that
    // forgets the pad byte desyncs and misses the fmt fourcc
    val wav = b('R', 'I', 'F', 'F', 60, 0, 0, 0, 'W', 'A', 'V', 'E',
      'x', 'y', 'z', ' ', 3, 0, 0, 0, 1, 2, 3, 0,
      'f', 'm', 't', ' ', 16, 0, 0, 0,
      1, 0, 1, 0, 0x10, 0x27, 0, 0, 0x10, 0x27, 0, 0, 1, 0, 8, 0,
      'd', 'a', 't', 'a', 10, 0, 0, 0) ++ Array.fill(10)(0.toByte)
    // 10000 Hz mono 8-bit, 10 frames -> 1 ms
    assert(Binary.decodeWavHeader(wav) ==
      (("wav", Some(1L), Some(10000L), Some(8L), Some(10L), Some(1L))))
  }

  test("malformed RIFF payloads degrade to unknown without throwing") {
    val cases = Seq(
      Array.emptyByteArray,
      b('R', 'I', 'F', 'F', 4, 0, 0, 0), // no WAVE tag
      b('R', 'I', 'F', 'F', 20, 0, 0, 0, 'W', 'A', 'V', 'E',
        'f', 'm', 't', ' ', 16, 0, 0, 0, 1, 0, 1, 0), // fmt truncated
      b('R', 'I', 'F', 'F', 20, 0, 0, 0, 'W', 'A', 'V', 'E',
        'd', 'a', 't', 'a', 0x7F, 0x7F, 0, 0, 1, 2), // data len past EOF
      b('R', 'I', 'F', 'F', 16, 0, 0, 0, 'W', 'A', 'V', 'E',
        'J', 'U', 'N', 'K', 4, 0, 0, 0, 1, 2, 3, 4), // no fmt/data at all
      // adversarial chunk sizes: 0xFFFFFFF8 truncates to a NEGATIVE Int
      // (-8 — a naive walk stops advancing and spins forever), and
      // 0x7FFFFFFF overflows the index into negative array positions
      b('R', 'I', 'F', 'F', 12, 0, 0, 0, 'W', 'A', 'V', 'E',
        'X', 'X', 'X', 'X', 0xF8, 0xFF, 0xFF, 0xFF),
      b('R', 'I', 'F', 'F', 12, 0, 0, 0, 'W', 'A', 'V', 'E',
        'X', 'X', 'X', 'X', 0xFF, 0xFF, 0xFF, 0x7F, 1, 2),
      "plain text payload".getBytes("UTF-8"))
    cases.foreach { c =>
      val (fmt, ch, rate, bits, frames, ms) = Binary.decodeWavHeader(c)
      assert(fmt == "unknown" && ch.isEmpty && rate.isEmpty && bits.isEmpty &&
        frames.isEmpty && ms.isEmpty,
        s"payload ${c.take(12).mkString(",")} decoded as $fmt")
    }
  }

  test("synthesized GIF payloads round-trip the construction parameters") {
    Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 40L, 997L, 1000L).foreach { id =>
      val G = operators.Binary.GifBytes
      val (fmt, ver, w, h, pc) =
        operators.Binary.decodeGifHeader(G.payload(id, "opaque text"))
      if (id % 4 <= 1) {
        val expVer = if (id % 4 == 0) "89a" else "87a"
        assert(fmt == "gif" && ver.contains(expVer) &&
          w.contains(G.width(id)) && h.contains(G.height(id)) &&
          pc.contains(G.paletteColors(id)),
          s"id $id: $fmt $ver $w $h $pc")
      } else {
        assert(fmt == "unknown" && ver.isEmpty && pc.isEmpty,
          s"id $id: $fmt $ver $w $h $pc")
      }
    }
  }

  test("GIF decoder degrades to unknown on malformed bytes, never throws") {
    val cases = Seq(
      Array.emptyByteArray,
      "GIF89a".getBytes("US-ASCII"),                    // no descriptor
      "GIF90a0000000".getBytes("US-ASCII"),             // unpublished version
      "GIF87".getBytes("US-ASCII") ++ Array.fill(8)(0.toByte), // short sig
      Array.fill(13)(0xFF.toByte))                      // wrong magic
    cases.foreach { c =>
      val (fmt, ver, w, h, pc) = operators.Binary.decodeGifHeader(c)
      assert(fmt == "unknown" && ver.isEmpty && w.isEmpty && h.isEmpty &&
        pc.isEmpty, s"payload ${c.take(12).mkString(",")} decoded as $fmt")
    }
  }

  test("synthesized WAV payloads round-trip the construction parameters") {
    Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 40L, 41L, 997L, 1000L).foreach { id =>
      val W = Binary.WavBytes
      val (fmt, ch, rate, bits, frames, ms) =
        Binary.decodeWavHeader(W.payload(id, "opaque text"))
      if (id % 4 <= 1) {
        assert(fmt == "wav" && ch.contains(W.channels(id)) &&
          rate.contains(W.sampleRate(id)) && bits.contains(W.bits(id)) &&
          frames.contains(W.nFrames(id)) &&
          ms.contains(W.nFrames(id) * 1000L / W.sampleRate(id)),
          s"id $id: $fmt $ch $rate $bits $frames $ms")
      } else {
        assert(fmt == "unknown" && ch.isEmpty,
          s"id $id: $fmt $ch $rate $bits $frames $ms")
      }
    }
  }

  // ---- q114: full-payload BMP pixel decode through the seam ----

  /** Handcrafted 2x2 24-bit BMP: stride 8 (2 pad bytes per row, 0xFF),
    * pixel bytes chosen so every stat is hand-checkable. */
  private def bmp2x2(hSigned: Int): Array[Byte] = {
    def le32(v: Long) = Seq(v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF,
      (v >> 24) & 0xFF).map(_.toInt)
    def le16(v: Long) = Seq(v & 0xFF, (v >> 8) & 0xFF).map(_.toInt)
    b((Seq('B'.toInt, 'M'.toInt) ++ le32(70) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(2) ++ le32(hSigned.toLong & 0xFFFFFFFFL) ++
      le16(1) ++ le16(24) ++ le32(0) ++ le32(16) ++
      le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++
      // file row 0: (1,2,3) (4,5,6) pad; file row 1: (7,8,9) (10,11,12) pad
      Seq(1, 2, 3, 4, 5, 6, 0xFF, 0xFF,
        7, 8, 9, 10, 11, 12, 0xFF, 0xFF)): _*)
  }

  test("decodes a handcrafted bottom-up BMP: pad bytes excluded, rows flipped") {
    val st = Binary.BmpPixelDecoder.decode(bmp2x2(2)).get
    assert(st.w == 2 && st.h == 2 && st.nPx == 4)
    // channel sums over pixels only — 0xFF pads must NOT leak in
    assert((st.sumB, st.sumG, st.sumR) == ((22L, 26L, 30L)), st)
    // bottom-up: file row 0 is image row 1 -> ysum = 1*(1+2+3+4+5+6) = 21
    assert(st.ysumLum == 21L, st)
  }

  test("decodes a handcrafted TOP-DOWN BMP (negative biHeight): no row flip") {
    val st = Binary.BmpPixelDecoder.decode(bmp2x2(-2)).get
    assert((st.w, st.h, st.nPx) == ((2L, 2L, 4L)))
    assert((st.sumB, st.sumG, st.sumR) == ((22L, 26L, 30L)), st)
    // top-down: file row 1 IS image row 1 -> ysum = 1*(7+..+12) = 57
    assert(st.ysumLum == 57L, st)
  }

  test("BMP decoder degrades to None on malformed bytes, never throws") {
    val good = bmp2x2(2)
    val cases = Seq(
      Array.empty[Byte],
      b(0) ++ "GIF87a not a bmp".getBytes("UTF-8"),
      good.take(53), // header truncated
      good.take(60), // pixel array truncated below stride * h
      { val c = good.clone(); c(28) = 8; c }, // bitCount 8 (unsupported)
      { val c = good.clone(); c(30) = 1; c }, // compressed (BI_RLE8)
      { val c = good.clone(); c(26) = 2; c }) // planes != 1
    cases.foreach(c => assert(Binary.BmpPixelDecoder.decode(c).isEmpty,
      s"payload ${c.take(8).mkString(",")} decoded"))
  }

  test("synthesized BMP payloads round-trip the construction stats") {
    val B = Binary.BmpBytes
    Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 96L, 97L, 998L, 1001L).foreach { id =>
      val out = Binary.BmpPixelDecoder.decode(B.payload(id, "opaque text"))
      if (id % 4 <= 1) {
        val st = out.get
        val (w, h) = (B.width(id), B.height(id))
        assert(st.w == w && st.h == h && st.nPx == w * h, s"id $id: $st")
        // restate the construction arithmetic (the oracle's job, here
        // for the decoder alone): channel sums + orientation moment
        var (sb, sg, sr, yl) = (0L, 0L, 0L, 0L)
        for (fr <- 0L until h; x <- 0L until w) {
          val (vb, vg, vr) = (B.px(id, fr, x, 0), B.px(id, fr, x, 1), B.px(id, fr, x, 2))
          sb += vb; sg += vg; sr += vr
          val y = if (id % 4 == 0) h - 1 - fr else fr
          yl += y * (vb + vg + vr)
        }
        assert((st.sumB, st.sumG, st.sumR, st.ysumLum) == ((sb, sg, sr, yl)),
          s"id $id: $st != ($sb,$sg,$sr,$yl)")
      } else assert(out.isEmpty, s"id $id decoded: $out")
    }
  }

  test("the decoder seam: q71's stub occupies the same interface") {
    val f = Binary.StrideSumDecoder.decode("abcdefghij".getBytes("US-ASCII")).get
    // stride-0 sum = 'a' + 'i' = 97 + 105
    assert(f(0) == 202L && f.length == 8)
    val dec: Binary.PayloadDecoder[Binary.BmpStats] = Binary.BmpPixelDecoder
    assert(dec.format == "bmp")
  }

  // ---- PNG full-pixel decode (q115) -------------------------------------

  /** Chunk + deflate helpers INDEPENDENT of PngBytes: the handcrafted
    * tests compress hand-written filtered scanlines with the standard
    * library, so the decoder's unfilter walk is pinned against
    * hand-computed raw pixels, not against the synthesizer's encoder
    * (matching encoder/decoder bugs cannot cancel here). */
  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    def be32(v: Long) = Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    be32(data.length.toLong) ++ t ++ data ++ be32(crc.getValue)
  }
  private def zlib(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](256)
    val bos = new java.io.ByteArrayOutputStream()
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end(); bos.toByteArray
  }
  private def pngSig = b(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
  private def pngIhdr(w: Int, h: Int, color: Int = 2) =
    pngChunk("IHDR", b(0, 0, 0, w, 0, 0, 0, h, 8, color, 0, 0, 0))
  private def png(scanlines: Array[Byte], w: Int, h: Int): Array[Byte] =
    pngSig ++ pngIhdr(w, h) ++ pngChunk("IDAT", zlib(scanlines)) ++
      pngChunk("IEND", Array.emptyByteArray)

  test("unfilters handcrafted Sub and Up scanlines to hand-computed pixels") {
    // 2x2 RGB: raw row0 = (1,2,3),(4,6,8); row1 = (10,20,30),(5,15,25)
    // row0 Sub-filtered:  [1, 1,2,3, 3,4,5]
    // row1 Up-filtered:   [2, 9,18,27, 1,9,17]
    val scan = b(1, 1, 2, 3, 3, 4, 5, 2, 9, 18, 27, 1, 9, 17)
    val st = Binary.PngPixelDecoder.decode(png(scan, 2, 2)).get
    assert(st == Binary.PngStats(2, 2, 4, 14, 20, 43, 66, 105), st.toString)
  }

  test("unfilters handcrafted Average and Paeth scanlines") {
    // 2x2 RGB: raw row0 = (10,20,30),(11,22,33); row1 = (40,50,60),(45,55,65)
    // row0 Average-filtered: [3, 10,20,30, 6,12,18]
    // row1 Paeth-filtered:   [4, 30,30,30, 5,5,5]
    val scan = b(3, 10, 20, 30, 6, 12, 18, 4, 30, 30, 30, 5, 5, 5)
    val st = Binary.PngPixelDecoder.decode(png(scan, 2, 2)).get
    assert(st == Binary.PngStats(2, 2, 4, 14, 106, 147, 188, 315), st.toString)
  }

  test("PNG decoder fails closed on corrupt chunks and bad streams") {
    val scan = b(0, 1, 2, 3, 0, 4, 5, 6) // 1x2, None filters
    val good = png(scan, 1, 2)
    assert(Binary.PngPixelDecoder.decode(good).isDefined)
    // flip one IDAT payload byte WITHOUT fixing the CRC -> reject
    val badCrc = good.clone()
    val idatPos = 8 + 25 + 8 // sig + IHDR chunk + IDAT len/type
    badCrc(idatPos + 2) = (badCrc(idatPos + 2) ^ 0x01).toByte
    assert(Binary.PngPixelDecoder.decode(badCrc).isEmpty, "CRC not verified")
    // truncated zlib stream (half the deflate bytes, CRC recomputed)
    val z = zlib(scan)
    val trunc = pngSig ++ pngIhdr(1, 2) ++
      pngChunk("IDAT", z.take(z.length / 2)) ++
      pngChunk("IEND", Array.emptyByteArray)
    assert(Binary.PngPixelDecoder.decode(trunc).isEmpty, "truncation accepted")
    // stream longer than the declared dimensions -> reject
    val over = pngSig ++ pngIhdr(1, 2) ++
      pngChunk("IDAT", zlib(scan ++ b(0, 7, 8, 9))) ++
      pngChunk("IEND", Array.emptyByteArray)
    assert(Binary.PngPixelDecoder.decode(over).isEmpty, "overlong accepted")
    // unsupported color type (grayscale+alpha) -> honest None
    val gray = pngSig ++ pngIhdr(1, 2, color = 4) ++
      pngChunk("IDAT", zlib(scan)) ++ pngChunk("IEND", Array.emptyByteArray)
    assert(Binary.PngPixelDecoder.decode(gray).isEmpty)
    // bad filter type byte -> reject
    val badFt = b(9, 1, 2, 3, 0, 4, 5, 6)
    assert(Binary.PngPixelDecoder.decode(png(badFt, 1, 2)).isEmpty)
    assert(Binary.PngPixelDecoder.decode(Array.emptyByteArray).isEmpty)
    assert(Binary.PngPixelDecoder.decode(b(0x89, 'P', 'N')).isEmpty)
  }

  test("synthesized PNG payloads round-trip the construction stats") {
    val P = Binary.PngBytes
    Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 40L, 41L, 997L, 1000L).foreach { id =>
      val out = Binary.PngPixelDecoder.decode(P.payload(id, "opaque text"))
      if (id % 4 <= 1) {
        val st = out.get
        val (w, h) = (P.width(id), P.height(id))
        assert(st.w == w && st.h == h && st.nPx == w * h &&
          st.rawLen == h * (1 + 3 * w), s"id $id: $st")
        var (sr, sg, sb, yl) = (0L, 0L, 0L, 0L)
        for (y <- 0L until h; x <- 0L until w) {
          val (vr, vg, vb) = (P.px(id, y, x, 0), P.px(id, y, x, 1), P.px(id, y, x, 2))
          sr += vr; sg += vg; sb += vb
          yl += y * (vr + vg + vb)
        }
        assert((st.sumR, st.sumG, st.sumB, st.ysumLum) == ((sr, sg, sb, yl)),
          s"id $id: $st != ($sr,$sg,$sb,$yl)")
      } else assert(out.isEmpty, s"id $id decoded: $out")
    }
  }

  // ---- PNG variant decode (q116: palette + Adam7) ------------------------

  private def pngIhdrV(w: Int, h: Int, color: Int, interlace: Int) =
    pngChunk("IHDR", b(0, 0, 0, w, 0, 0, 0, h, 8, color, 0, 0, interlace))

  test("decodes a handcrafted palette PNG through the PLTE lookup") {
    // 2x2 indexed, palette e0=(1,2,3) e1=(10,20,30) e2=(100,110,120);
    // row0 = [0,2] None-filtered; row1 = [1,1] Sub-filtered (bpp=1)
    val plte = pngChunk("PLTE", b(1, 2, 3, 10, 20, 30, 100, 110, 120))
    val scan = b(0, 0, 2, 1, 1, 0)
    val img = pngSig ++ pngIhdrV(2, 2, color = 3, interlace = 0) ++ plte ++
      pngChunk("IDAT", zlib(scan)) ++ pngChunk("IEND", Array.emptyByteArray)
    val st = Binary.PngVariantDecoder.decode(img).get
    assert(st == Binary.PngVariantStats(2, 2, 4, 3, 3, 0,
      121, 152, 183, 120, 390), st.toString)
  }

  test("decodes a handcrafted Adam7 interlaced PNG at final coordinates") {
    // 2x2 truecolor interlaced: pass0 -> (0,0)=(1,2,3);
    // pass5 -> (x1,y0)=(4,5,6); pass6 -> (0,1)=(7,8,9),(1,1)=(10,11,12);
    // passes 1-4 are empty at 2x2. All filter type 0.
    val scan = b(0, 1, 2, 3) ++ b(0, 4, 5, 6) ++ b(0, 7, 8, 9, 10, 11, 12)
    val img = pngSig ++ pngIhdrV(2, 2, color = 2, interlace = 1) ++
      pngChunk("IDAT", zlib(scan)) ++ pngChunk("IEND", Array.emptyByteArray)
    val st = Binary.PngVariantDecoder.decode(img).get
    assert(st == Binary.PngVariantStats(2, 2, 4, 2, 0, 1,
      22, 26, 30, 57, 48), st.toString)
  }

  test("variant decoder fails closed on palette violations and bad layout") {
    val plte3 = pngChunk("PLTE", b(1, 2, 3, 10, 20, 30, 100, 110, 120))
    // index 3 with a 3-entry palette -> out of range, no partial stats
    val poisoned = pngSig ++ pngIhdrV(2, 1, color = 3, interlace = 0) ++
      plte3 ++ pngChunk("IDAT", zlib(b(0, 0, 3))) ++
      pngChunk("IEND", Array.emptyByteArray)
    assert(Binary.PngVariantDecoder.decode(poisoned).isEmpty,
      "out-of-range palette index accepted")
    // color type 3 without PLTE -> reject
    val noPlte = pngSig ++ pngIhdrV(2, 1, color = 3, interlace = 0) ++
      pngChunk("IDAT", zlib(b(0, 0, 1))) ++
      pngChunk("IEND", Array.emptyByteArray)
    assert(Binary.PngVariantDecoder.decode(noPlte).isEmpty, "PLTE-less indexed")
    // PLTE arriving after IDAT violates the spec ordering -> reject
    val lateePlte = pngSig ++ pngIhdrV(2, 1, color = 3, interlace = 0) ++
      pngChunk("IDAT", zlib(b(0, 0, 1))) ++ plte3 ++
      pngChunk("IEND", Array.emptyByteArray)
    assert(Binary.PngVariantDecoder.decode(lateePlte).isEmpty, "late PLTE")
    // interlaced stream sized for the NON-interlaced layout -> reject
    // (2x2 plain = 2 rows x 7 bytes = 14; Adam7 needs 4+4+7 = 15)
    val plainScan = b(0, 1, 2, 3, 4, 5, 6, 0, 7, 8, 9, 10, 11, 12)
    val wrongLen = pngSig ++ pngIhdrV(2, 2, color = 2, interlace = 1) ++
      pngChunk("IDAT", zlib(plainScan)) ++
      pngChunk("IEND", Array.emptyByteArray)
    assert(Binary.PngVariantDecoder.decode(wrongLen).isEmpty,
      "interlace-mis-sized stream accepted")
  }

  test("synthesized variant payloads round-trip the construction stats") {
    val P = Binary.PngVariantBytes
    Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 40L, 41L, 997L, 1000L)
      .foreach { id =>
        val out = Binary.PngVariantDecoder.decode(P.payload(id, "opaque"))
        if (id % 4 <= 1) {
          val st = out.get
          val (w, h) = (P.width(id), P.height(id))
          var (sr, sg, sb, yl, xl) = (0L, 0L, 0L, 0L, 0L)
          for (y <- 0L until h; x <- 0L until w) {
            val (vr, vg, vb) =
              if (id % 4 == 0)
                (P.pal(id, P.idx(id, y, x), 0), P.pal(id, P.idx(id, y, x), 1),
                  P.pal(id, P.idx(id, y, x), 2))
              else (P.px(id, y, x, 0), P.px(id, y, x, 1), P.px(id, y, x, 2))
            sr += vr; sg += vg; sb += vb
            yl += y * (vr + vg + vb); xl += x * (vr + vg + vb)
          }
          val expect = Binary.PngVariantStats(w, h, w * h,
            if (id % 4 == 0) 3 else 2, if (id % 4 == 0) P.palSize(id) else 0,
            id % 4, sr, sg, sb, yl, xl)
          assert(st == expect, s"id $id: $st != $expect")
        } else assert(out.isEmpty, s"id $id decoded: $out")
      }
  }

  test("PNG decoders fail closed on oversized headers, FDICT and boundary truncation") {
    // declared-huge dimensions (2^20 x 2^20 passes the per-dimension
    // caps but overflows Int as a byte count): must read as None, not
    // throw on array allocation — corrupt blobs degrade, never kill
    def be(v: Long) = b(((v >> 24) & 0xFF).toInt, ((v >> 16) & 0xFF).toInt,
      ((v >> 8) & 0xFF).toInt, (v & 0xFF).toInt)
    val hugeIhdr = pngChunk("IHDR",
      be(1L << 20) ++ be(1L << 20) ++ b(8, 2, 0, 0, 0))
    val huge = pngSig ++ hugeIhdr ++ pngChunk("IDAT", zlib(b(0, 1, 2, 3))) ++
      pngChunk("IEND", Array.emptyByteArray)
    assert(Binary.PngPixelDecoder.decode(huge).isEmpty, "q115 huge dims")
    val hugeV = pngSig ++ pngChunk("IHDR",
      be(1L << 20) ++ be(1L << 20) ++ b(8, 2, 0, 0, 1)) ++
      pngChunk("IDAT", zlib(b(0, 1, 2, 3))) ++
      pngChunk("IEND", Array.emptyByteArray)
    assert(Binary.PngVariantDecoder.decode(hugeV).isEmpty, "q116 huge dims")

    // zlib FDICT header (preset dictionary — never valid in PNG):
    // Inflater returns 0 with needsDictionary, which must fail closed,
    // not spin the inflate loop forever. CMF=0x78 FLG=0x20 satisfies
    // the fcheck rule ((0x7820) % 31 == 0) with the FDICT bit set.
    val fdict = b(0x78, 0x20, 1, 2, 3, 4, 9, 9, 9, 9)
    val fdictPng = pngSig ++ pngIhdrV(1, 1, color = 2, interlace = 0) ++
      pngChunk("IDAT", fdict) ++ pngChunk("IEND", Array.emptyByteArray)
    assert(Binary.PngVariantDecoder.decode(fdictPng).isEmpty, "FDICT accepted")

    // zlib stream truncated EXACTLY at the expected byte count (final
    // block flag + adler32 trailer missing): finished() is the only
    // witness, and the decoder must reject
    val scan = b(0, 1, 2, 3) // 1x1 truecolor, None filter
    val z = zlib(scan)
    val cut = z.take(z.length - 5) // drop the adler32 + final-block tail
    val truncV = pngSig ++ pngIhdrV(1, 1, color = 2, interlace = 0) ++
      pngChunk("IDAT", cut) ++ pngChunk("IEND", Array.emptyByteArray)
    assert(Binary.PngVariantDecoder.decode(truncV).isEmpty,
      "boundary-truncated zlib accepted")
  }

  // ---- WAV full-payload PCM decode (q117) --------------------------------

  /** RIFF helpers independent of WavPcmBytes (matching encoder/decoder
    * bugs cannot cancel). */
  private def wle16(v: Int) = b(v & 0xFF, (v >> 8) & 0xFF)
  private def wle32(v: Int) = b(v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF,
    (v >> 24) & 0xFF)
  private def wfmt(ch: Int) = "fmt ".getBytes("US-ASCII") ++ wle32(16) ++
    wle16(1) ++ wle16(ch) ++ wle32(8000) ++ wle32(8000 * ch * 2) ++
    wle16(ch * 2) ++ wle16(16)
  private def wriff(body: Array[Byte]) = "RIFF".getBytes("US-ASCII") ++
    wle32(body.length + 4) ++ "WAVE".getBytes("US-ASCII") ++ body
  private def wdata(samples: Seq[Int]) = "data".getBytes("US-ASCII") ++
    wle32(samples.length * 2) ++ samples.flatMap(s => wle16(s & 0xFFFF)).toArray

  test("decodes handcrafted mono and stereo PCM to hand-computed stats") {
    // mono, frames [100, -3]
    val mono = wriff(wfmt(1) ++ wdata(Seq(100, -3)))
    val m = Binary.WavPcmDecoder.decode(mono).get
    assert(m == Binary.WavPcmStats(1, 8000, 2, 97, -3, 100, -3, 0, 0, 0),
      m.toString)
    // stereo, frames L=[1000,-2000] R=[-1,7] interleaved
    val stereo = wriff(wfmt(2) ++ wdata(Seq(1000, -1, -2000, 7)))
    val s = Binary.WavPcmDecoder.decode(stereo).get
    assert(s == Binary.WavPcmStats(2, 8000, 2, -1000, -2000, 1000, -2000,
      6, -1, 7), s.toString)
  }

  test("PCM decoder fails closed on truncation, misalignment and non-PCM") {
    // data declares 2 bytes more than present
    val trunc = wriff(wfmt(1) ++ "data".getBytes("US-ASCII") ++ wle32(6) ++
      wle16(1) ++ wle16(2))
    assert(Binary.WavPcmDecoder.decode(trunc).isEmpty, "truncation accepted")
    // stereo data size not a multiple of block align (4)
    val misaligned = wriff(wfmt(2) ++ "data".getBytes("US-ASCII") ++
      wle32(6) ++ wle16(1) ++ wle16(2) ++ wle16(3))
    assert(Binary.WavPcmDecoder.decode(misaligned).isEmpty, "misaligned size")
    // non-PCM format tag
    val fl = "fmt ".getBytes("US-ASCII") ++ wle32(16) ++ wle16(3) ++
      wle16(1) ++ wle32(8000) ++ wle32(16000) ++ wle16(2) ++ wle16(16)
    assert(Binary.WavPcmDecoder.decode(
      wriff(fl ++ wdata(Seq(1)))).isEmpty, "non-PCM accepted")
    // byte rate inconsistent with rate * block align
    val badBr = "fmt ".getBytes("US-ASCII") ++ wle32(16) ++ wle16(1) ++
      wle16(1) ++ wle32(8000) ++ wle32(0) ++ wle16(2) ++ wle16(16)
    assert(Binary.WavPcmDecoder.decode(
      wriff(badBr ++ wdata(Seq(1)))).isEmpty, "bad byte rate accepted")
    assert(Binary.WavPcmDecoder.decode(Array.emptyByteArray).isEmpty)
  }

  test("synthesized PCM payloads round-trip the construction stats") {
    val P = Binary.WavPcmBytes
    Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 40L, 41L, 997L, 1000L).foreach { id =>
      val out = Binary.WavPcmDecoder.decode(P.payload(id, "opaque"))
      if (id % 4 <= 1) {
        val st = out.get
        val (ch, n) = (P.channels(id), P.nFrames(id))
        var (sl, nl, xl, im) = (0L, Long.MaxValue, Long.MinValue, 0L)
        var (sr, nr, xr) = (0L, Long.MaxValue, Long.MinValue)
        for (i <- 0L until n) {
          val l = P.sample(id, i, 0)
          sl += l; nl = math.min(nl, l); xl = math.max(xl, l); im += i * l
          if (ch == 2) {
            val r = P.sample(id, i, 1)
            sr += r; nr = math.min(nr, r); xr = math.max(xr, r)
          }
        }
        if (ch == 1) { sr = 0; nr = 0; xr = 0 }
        val expect = Binary.WavPcmStats(ch, 8000, n, sl, nl, xl, im, sr, nr, xr)
        assert(st == expect, s"id $id: $st != $expect")
      } else assert(out.isEmpty, s"id $id decoded: $out")
    }
  }

  // ---- MP4 box walk (q118) -----------------------------------------------

  /** ISO-BMFF helpers independent of Mp4Bytes. */
  private def mbe32(v: Long) = b(((v >> 24) & 0xFF).toInt, ((v >> 16) & 0xFF).toInt,
    ((v >> 8) & 0xFF).toInt, (v & 0xFF).toInt)
  private def mbox(typ: String, payload: Array[Byte]) =
    mbe32(payload.length + 8L) ++ typ.getBytes("US-ASCII") ++ payload
  private def mftyp = mbox("ftyp", "isom".getBytes("US-ASCII") ++ mbe32(512))
  private def mmvhd0(ts: Long, dur: Long) = mbox("mvhd",
    b(0, 0, 0, 0) ++ mbe32(0) ++ mbe32(0) ++ mbe32(ts) ++ mbe32(dur) ++
      new Array[Byte](80))
  private def mtkhd0(tid: Long) = mbox("tkhd",
    b(0, 0, 0, 7) ++ mbe32(0) ++ mbe32(0) ++ mbe32(tid) ++ mbe32(0) ++
      mbe32(0) ++ new Array[Byte](52))

  test("walks a handcrafted MP4 box tree to hand-computed container stats") {
    val moov = mbox("moov", mmvhd0(600, 1200) ++
      mbox("trak", mtkhd0(1)) ++ mbox("trak", mtkhd0(5)))
    val mdat = mbox("mdat", b(10, 20, 30))
    val st = Binary.Mp4Decoder.decode(mftyp ++ moov ++ mdat).get
    assert(st == Binary.Mp4Stats("isom", 600, 1200, 2000, 2, 6, 3, 60),
      st.toString)
  }

  test("MP4 walk fails closed on structural violations") {
    val moov = mbox("moov", mmvhd0(600, 1200) ++ mbox("trak", mtkhd0(1)))
    val mdat = mbox("mdat", b(1))
    // ftyp must lead
    assert(Binary.Mp4Decoder.decode(moov ++ mftyp ++ mdat).isEmpty,
      "ftyp-not-first accepted")
    // a child declaring more bytes than its parent holds
    val badChild = mbox("moov",
      mbe32(mmvhd0(600, 1200).length + 4L) ++ mmvhd0(600, 1200).drop(4))
    assert(Binary.Mp4Decoder.decode(mftyp ++ badChild).isEmpty,
      "overrunning child accepted")
    // duplicate moov
    assert(Binary.Mp4Decoder.decode(mftyp ++ moov ++ moov).isEmpty,
      "duplicate moov accepted")
    // unknown mvhd version
    val badV = mbox("moov", mbox("mvhd", b(9, 0, 0, 0) ++ new Array[Byte](96)))
    assert(Binary.Mp4Decoder.decode(mftyp ++ badV).isEmpty, "mvhd v9 accepted")
    // trak without tkhd
    val noTkhd = mbox("moov", mmvhd0(1, 1) ++ mbox("trak", mbox("free", b(0))))
    assert(Binary.Mp4Decoder.decode(mftyp ++ noTkhd).isEmpty,
      "tkhd-less trak accepted")
    assert(Binary.Mp4Decoder.decode(Array.emptyByteArray).isEmpty)
    // 64-bit largesize near Long.MaxValue: a naive i + size bounds
    // check overflows negative and the walk never terminates — must
    // return None promptly
    val lmax = java.lang.Long.MAX_VALUE - 23L
    val hugeBox = mbe32(1) ++ "mdat".getBytes("US-ASCII") ++
      mbe32(lmax >> 32) ++ mbe32(lmax & 0xFFFFFFFFL)
    assert(Binary.Mp4Decoder.decode(mftyp ++ hugeBox).isEmpty,
      "overflowing largesize accepted")
    // header-only mvhd/tkhd ending at the buffer edge: the version
    // byte would be read past the array — must degrade, not throw
    val bareMvhd = mbox("moov", mbe32(8) ++ "mvhd".getBytes("US-ASCII"))
    assert(Binary.Mp4Decoder.decode(mftyp ++ bareMvhd).isEmpty,
      "header-only mvhd accepted")
    val bareTkhd = mbox("moov", mmvhd0(1, 1) ++
      mbox("trak", mbe32(8) ++ "tkhd".getBytes("US-ASCII")))
    assert(Binary.Mp4Decoder.decode(mftyp ++ bareTkhd).isEmpty,
      "header-only tkhd accepted")
  }

  test("synthesized MP4 payloads round-trip the construction stats") {
    val P = Binary.Mp4Bytes
    Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 40L, 41L, 997L, 1000L)
      .foreach { id =>
        val out = Binary.Mp4Decoder.decode(P.payload(id, "opaque"))
        if (id % 4 <= 1) {
          val st = out.get
          val nt = P.nTraks(id)
          val expect = Binary.Mp4Stats("isom", P.timescale(id),
            P.durationTicks(id),
            P.durationTicks(id) * 1000L / P.timescale(id), nt,
            nt * (nt + 1) / 2, P.mdatLen(id), P.mdatSum(id))
          assert(st == expect, s"id $id: $st != $expect")
        } else assert(out.isEmpty, s"id $id decoded: $out")
      }
  }
}
