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
}
