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
}
