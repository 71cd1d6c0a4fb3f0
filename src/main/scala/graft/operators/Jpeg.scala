package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q119: BASELINE JPEG full-pixel decode — the lossy-compressed codec
  * completing the image taxonomy q114 (uncompressed BMP) and q115/q116
  * (lossless-compressed PNG) built: entropy-coded frequency-domain data
  * that a decoder must huffman-decode, dequantize, inverse-DCT and
  * color-convert before a single pixel exists.
  *
  * The payloads are FORMAT-TRUE baseline sequential JPEGs (SOI/DQT/
  * SOF0/DHT/[DRI]/SOS/EOI, 8-bit, 3 components, 4:4:4), constructed in
  * the FREQUENCY domain: per 8x8 block the luma carries a known DC and
  * one known horizontal-frequency-1 AC coefficient, the chroma planes a
  * known DC each — so the decoded samples are CLOSED-FORM in the
  * construction parameters and the DuckDB oracle can restate the whole
  * pipeline (dequant x IDCT basis x level shift x rounding x
  * YCbCr→RGB) in exact arithmetic. Bit-parity discipline: the decoder's
  * per-pixel float expressions and the oracle SQL share literally the
  * same double constants (the cosine table and 1/√2 are interpolated
  * into the SQL from the same Scala values) and the same operation
  * order, so the gate is hash-exact, not approximately-close.
  *
  * The DECODER is a real generic baseline implementation, none of the
  * construction knowledge leaks in: marker walk (APPn/COM skips, DQT
  * multi-table, SOF0 with sampling validation, DHT canonical code
  * building, DRI), MSB-first bit reader with 0xFF00 unstuffing and
  * RSTn handling (DC predictor reset), per-component DPCM DC + run/
  * length AC with ZRL/EOB and the EXTEND sign rule, zigzag-to-natural
  * mapping, full 64-term float IDCT, and BT.601 YCbCr→RGB — plus, for
  * q119b, declared sampling factors with multi-block MCU interleave
  * and box-replication chroma upsampling (4:4:4 and 4:2:0 supported).
  * Truncated scans, unsupported SOFs, sampling layouts beyond those
  * two, and invalid codes all fail CLOSED to 'unknown' — a corrupt
  * blob in a 100 TB corpus must degrade, never kill the stage (the
  * q98/q115 rule).
  *
  * Scale shape: row-local mapPartitions decode through the
  * [[Binary.PayloadDecoder]] seam, no shuffle before the presentation
  * sort. Ref: the reference pipeline treats media as opaque payloads
  * around its Solr/Kudu flows; a training-data pipeline decodes them —
  * this is the lossy-codec member of that family. */
object Jpeg extends QueryPack {

  // ---- construction parameters (shared by encoder and oracle) ----
  private[graft] object JpegBytes {
    def wBlocks(id: Long): Int = (1L + (id * 31L) % 3L).toInt
    def hBlocks(id: Long): Int = (1L + (id * 47L) % 2L).toInt
    def width(id: Long): Long = 8L * wBlocks(id)
    def height(id: Long): Long = 8L * hBlocks(id)
    /** Quantized coefficients per block (bx, by): luma DC, luma AC at
      * zigzag 1 (horizontal frequency 1), chroma DCs. */
    def dcY(id: Long, bx: Int, by: Int): Int =
      (((id + 7L * bx + 13L * by) % 33L) - 16L).toInt
    def acY(id: Long, bx: Int, by: Int): Int =
      (((id + 11L * bx + 5L * by) % 13L) - 6L).toInt
    def dcCb(id: Long, bx: Int, by: Int): Int =
      (((id + 3L * bx + by) % 21L) - 10L).toInt
    def dcCr(id: Long, bx: Int, by: Int): Int =
      (((id + 5L * bx + 3L * by) % 19L) - 9L).toInt
    /** Quant tables in ZIGZAG order (the DQT wire order). */
    def qLum(k: Int): Int = 8 + (k % 5)
    def qChr(k: Int): Int = 10 + (k % 7)

    // canonical huffman tables the DHT segments carry: DC = 12
    // category symbols at 4 bits, AC = EOB + (run 0, size 1..10) + ZRL
    // at 5 bits — small, valid (no all-ones code), and fully exercised
    // by the decoder's generic table builder
    private[graft] val DcBits: Array[Int] =
      Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    private[graft] val DcVals: Array[Int] = (0 to 11).toArray
    private[graft] val AcBits: Array[Int] =
      Array(0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    private[graft] val AcVals: Array[Int] =
      (Array(0x00) ++ (1 to 10).map(s => s) ++ Array(0xF0)).toArray

    /** Canonical code assignment: (symbol -> (code, length)). */
    private def codes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
      var code = 0
      var vi = 0
      val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
      (1 to 16).foreach { len =>
        (0 until bits(len - 1)).foreach { _ =>
          out(vals(vi)) = (code, len)
          code += 1
          vi += 1
        }
        code <<= 1
      }
      out.toMap
    }
    private val dcCodes = codes(DcBits, DcVals)
    private val acCodes = codes(AcBits, AcVals)

    private final class BitWriter {
      private val buf = new java.io.ByteArrayOutputStream()
      private var acc = 0
      private var nbits = 0
      def write(v: Int, n: Int): Unit = {
        var i = n - 1
        while (i >= 0) {
          acc = (acc << 1) | ((v >> i) & 1)
          nbits += 1
          if (nbits == 8) {
            buf.write(acc)
            if (acc == 0xFF) buf.write(0x00) // byte stuffing
            acc = 0; nbits = 0
          }
          i -= 1
        }
      }
      /** Pad the final partial byte with 1-bits (the T.81 rule). */
      def flush(): Unit = if (nbits > 0) {
        acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
        buf.write(acc)
        if (acc == 0xFF) buf.write(0x00)
        acc = 0; nbits = 0
      }
      def raw(b: Int): Unit = buf.write(b)
      def bytes: Array[Byte] = buf.toByteArray
    }

    private def bitSize(v: Int): Int = {
      var a = math.abs(v); var s = 0
      while (a > 0) { a >>= 1; s += 1 }
      s
    }

    private def writeCoef(w: BitWriter, table: Map[Int, (Int, Int)],
        sym: Int, v: Int, size: Int): Unit = {
      val (code, len) = table(sym)
      w.write(code, len)
      if (size > 0) {
        // EXTEND inverse: negatives are stored as v + 2^size - 1
        val bitsV = if (v < 0) v + (1 << size) - 1 else v
        w.write(bitsV, size)
      }
    }

    private def seg(marker: Int, payload: Array[Byte]): Array[Byte] = {
      val len = payload.length + 2
      Array(0xFF.toByte, marker.toByte,
        ((len >> 8) & 0xFF).toByte, (len & 0xFF).toByte) ++ payload
    }

    private def dqt: Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(0x00) // Pq=0 (8-bit), Tq=0
      (0 until 64).foreach(k => b.write(qLum(k)))
      b.write(0x01) // Tq=1
      (0 until 64).foreach(k => b.write(qChr(k)))
      seg(0xDB, b.toByteArray)
    }

    private def sof0(id: Long): Array[Byte] = {
      val (w, h) = (width(id).toInt, height(id).toInt)
      seg(0xC0, Array[Byte](8,
        ((h >> 8) & 0xFF).toByte, (h & 0xFF).toByte,
        ((w >> 8) & 0xFF).toByte, (w & 0xFF).toByte,
        3,
        1, 0x11, 0, // Y: 1x1 sampling, quant table 0
        2, 0x11, 1, // Cb
        3, 0x11, 1)) // Cr
    }

    private def dht: Array[Byte] = {
      def table(cls: Int, tid: Int, bits: Array[Int], vals: Array[Int]) =
        Array(((cls << 4) | tid).toByte) ++ bits.map(_.toByte) ++
          vals.map(_.toByte)
      // four tables in one segment: DC/AC for luma (0) and chroma (1)
      seg(0xC4, table(0, 0, DcBits, DcVals) ++ table(1, 0, AcBits, AcVals) ++
        table(0, 1, DcBits, DcVals) ++ table(1, 1, AcBits, AcVals))
    }

    private def sos: Array[Byte] =
      seg(0xDA, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))

    private def dri(interval: Int): Array[Byte] =
      seg(0xDD, Array[Byte](((interval >> 8) & 0xFF).toByte,
        (interval & 0xFF).toByte))

    /** The entropy-coded scan: MCUs in raster order, Y then Cb then Cr
      * per MCU; with `restartRows` a DRI interval of one MCU row and an
      * RSTn between rows (DC predictors reset). */
    private def scan(id: Long, restartRows: Boolean): Array[Byte] = {
      val (wB, hB) = (wBlocks(id), hBlocks(id))
      val w = new BitWriter
      var (pY, pCb, pCr) = (0, 0, 0)
      var rst = 0
      (0 until hB).foreach { by =>
        if (restartRows && by > 0) {
          w.flush()
          w.raw(0xFF); w.raw(0xD0 + (rst % 8))
          rst += 1
          pY = 0; pCb = 0; pCr = 0
        }
        (0 until wB).foreach { bx =>
          // Y block: DC diff, one AC at zigzag 1 (when nonzero), EOB
          val dy = dcY(id, bx, by)
          writeCoef(w, dcCodes, bitSize(dy - pY), dy - pY, bitSize(dy - pY))
          pY = dy
          val ay = acY(id, bx, by)
          if (ay != 0)
            writeCoef(w, acCodes, bitSize(ay), ay, bitSize(ay))
          writeCoef(w, acCodes, 0x00, 0, 0) // EOB
          // Cb, Cr: DC only
          val db = dcCb(id, bx, by)
          writeCoef(w, dcCodes, bitSize(db - pCb), db - pCb, bitSize(db - pCb))
          pCb = db
          writeCoef(w, acCodes, 0x00, 0, 0)
          val dr = dcCr(id, bx, by)
          writeCoef(w, dcCodes, bitSize(dr - pCr), dr - pCr, bitSize(dr - pCr))
          pCr = dr
          writeCoef(w, acCodes, 0x00, 0, 0)
        }
      }
      w.flush()
      w.bytes
    }

    private val Soi = Array(0xFF.toByte, 0xD8.toByte)
    private val Eoi = Array(0xFF.toByte, 0xD9.toByte)

    // ---- 4:2:0 tier (q119b): 16x16 MCUs of 4 luma + 1 Cb + 1 Cr ----
    def wMcus420(id: Long): Int = (1L + (id * 29L) % 2L).toInt
    def width420(id: Long): Long = 16L * wMcus420(id)
    val Height420 = 16L
    /** Luma DC per MCU quadrant b = 2*vv + hh — four DIFFERENT values,
      * so a wrong intra-MCU block placement or interleave order moves a
      * quadrant's gray level and breaks the y-moment. */
    def dcY420(id: Long, mx: Int, bq: Int): Int =
      (((id + 9L * mx + 7L * bq) % 41L) - 20L).toInt
    def dcCb420(id: Long, mx: Int): Int = (((id + 5L * mx) % 21L) - 10L).toInt
    /** Horizontal-frequency-1 chroma AC: the UPSAMPLING gate — each
      * chroma sample covers two luma columns, so a wrong replication
      * (x vs x/2) shifts the blue/green channel sums. */
    def acCb420(id: Long, mx: Int): Int = (((id + 3L * mx) % 11L) - 5L).toInt
    def dcCr420(id: Long, mx: Int): Int = (((id + 7L * mx) % 19L) - 9L).toInt

    private def sof420(id: Long): Array[Byte] = {
      val (w, h) = (width420(id).toInt, Height420.toInt)
      seg(0xC0, Array[Byte](8,
        ((h >> 8) & 0xFF).toByte, (h & 0xFF).toByte,
        ((w >> 8) & 0xFF).toByte, (w & 0xFF).toByte,
        3,
        1, 0x22, 0, // Y: 2x2 sampling
        2, 0x11, 1, // Cb: 1x1
        3, 0x11, 1)) // Cr: 1x1
    }

    private def scan420(id: Long, restart: Boolean): Array[Byte] = {
      val wM = wMcus420(id)
      val w = new BitWriter
      var (pY, pCb, pCr) = (0, 0, 0)
      var rst = 0
      (0 until wM).foreach { mx =>
        if (restart && mx > 0) {
          w.flush()
          w.raw(0xFF); w.raw(0xD0 + (rst % 8))
          rst += 1
          pY = 0; pCb = 0; pCr = 0
        }
        // four Y blocks, T.81 order (vv outer, hh inner), DC chained
        (0 until 2).foreach { vv =>
          (0 until 2).foreach { hh =>
            val dy = dcY420(id, mx, 2 * vv + hh)
            writeCoef(w, dcCodes, bitSize(dy - pY), dy - pY, bitSize(dy - pY))
            pY = dy
            writeCoef(w, acCodes, 0x00, 0, 0)
          }
        }
        val db = dcCb420(id, mx)
        writeCoef(w, dcCodes, bitSize(db - pCb), db - pCb, bitSize(db - pCb))
        pCb = db
        val ab = acCb420(id, mx)
        if (ab != 0) writeCoef(w, acCodes, bitSize(ab), ab, bitSize(ab))
        writeCoef(w, acCodes, 0x00, 0, 0)
        val dr = dcCr420(id, mx)
        writeCoef(w, dcCodes, bitSize(dr - pCr), dr - pCr, bitSize(dr - pCr))
        pCr = dr
        writeCoef(w, acCodes, 0x00, 0, 0)
      }
      w.flush()
      w.bytes
    }

    def payload420(id: Long, text: String): Array[Byte] = (id % 3) match {
      case 0 => // canonical 4:2:0
        Soi ++ dqt ++ sof420(id) ++ dht ++ sos ++
          scan420(id, restart = false) ++ Eoi
      case 1 => // restart interval of one (multi-block) MCU
        Soi ++ dqt ++ sof420(id) ++ dht ++ dri(1) ++ sos ++
          scan420(id, restart = true) ++ Eoi
      case _ => // opaque non-image payload
        Array[Byte](0) ++ text.getBytes("UTF-8")
    }

    // ---- edge-clipped tier (q119c): arbitrary (non-multiple-of-8)
    // declared dimensions over the same 4:4:4 block grid — the coded
    // MCU grid is the CEIL grid (T.81: edge blocks are coded in full),
    // and the declared width/height clip the decoded padding off
    def widthE(id: Long): Long = width(id) - 1L - (id * 5L) % 7L
    def heightE(id: Long): Long = height(id) - (id * 3L) % 5L

    private def sofE(id: Long): Array[Byte] = {
      val (w, h) = (widthE(id).toInt, heightE(id).toInt)
      seg(0xC0, Array[Byte](8,
        ((h >> 8) & 0xFF).toByte, (h & 0xFF).toByte,
        ((w >> 8) & 0xFF).toByte, (w & 0xFF).toByte,
        3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
    }

    def payloadEdge(id: Long, text: String): Array[Byte] = (id % 3) match {
      case 0 => // canonical edge-clipped baseline
        Soi ++ dqt ++ sofE(id) ++ dht ++ sos ++
          scan(id, restartRows = false) ++ Eoi
      case 1 => // with restart rows (the interval counts CEIL-grid MCUs)
        Soi ++ dqt ++ sofE(id) ++ dht ++ dri(wBlocks(id)) ++ sos ++
          scan(id, restartRows = true) ++ Eoi
      case _ => // opaque non-image payload
        Array[Byte](0) ++ text.getBytes("UTF-8")
    }

    def payload(id: Long, text: String): Array[Byte] = (id % 4) match {
      case 0 => // canonical single-scan baseline
        Soi ++ dqt ++ sof0(id) ++ dht ++ sos ++ scan(id, restartRows = false) ++ Eoi
      case 1 => // restart-interval variant: DRI + RSTn per MCU row
        Soi ++ dqt ++ sof0(id) ++ dht ++ dri(wBlocks(id)) ++ sos ++
          scan(id, restartRows = true) ++ Eoi
      case 2 => // truncated entropy stream: decode must fail closed
        val full = scan(id, restartRows = false)
        Soi ++ dqt ++ sof0(id) ++ dht ++ sos ++
          full.take(math.max(1, full.length / 2))
      case _ => // opaque non-image payload
        Array[Byte](0) ++ text.getBytes("UTF-8")
    }

    // ---- progressive tier (q119d): SOF2 multi-scan over the SAME
    // per-block coefficients as q119 — successive approximation (DC/AC
    // first passes at Al=1, then refinement scans) and spectral
    // selection (split AC bands, cross-block EOB runs). The fully
    // refined coefficients equal the baseline ones, so the decoded
    // image — and therefore the ORACLE — is q119's verbatim.
    private def sof2(id: Long): Array[Byte] = {
      val (w, h) = (width(id).toInt, height(id).toInt)
      seg(0xC2, Array[Byte](8,
        ((h >> 8) & 0xFF).toByte, (h & 0xFF).toByte,
        ((w >> 8) & 0xFF).toByte, (w & 0xFF).toByte,
        3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
    }

    /** Progressive AC table: EOB(0x00), new-value sizes 1..10 (run 0),
      * ZRL, and EOBRUN ranks 1..3 (0x10/0x20/0x30 — runs of 2..15
      * blocks) — 15 symbols at 5 bits, canonical, no all-ones code. */
    private[graft] val AcBitsProg: Array[Int] =
      Array(0, 0, 0, 0, 15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    private[graft] val AcValsProg: Array[Int] =
      (Array(0x00) ++ (1 to 10) ++ Array(0xF0, 0x10, 0x20, 0x30)).toArray
    private val acProgCodes = codes(AcBitsProg, AcValsProg)

    private def dhtProg: Array[Byte] = {
      def table(cls: Int, tid: Int, bits: Array[Int], vals: Array[Int]) =
        Array(((cls << 4) | tid).toByte) ++ bits.map(_.toByte) ++
          vals.map(_.toByte)
      seg(0xC4, table(0, 0, DcBits, DcVals) ++ table(1, 0, AcBitsProg, AcValsProg) ++
        table(0, 1, DcBits, DcVals) ++ table(1, 1, AcBitsProg, AcValsProg))
    }

    /** Progressive scan header: components (id, dcTab, acTab) +
      * spectral band [ss, se] + successive approximation Ah/Al. */
    private def sosProg(comps: Seq[(Int, Int, Int)], ss: Int, se: Int,
        ah: Int, al: Int): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(comps.size)
      comps.foreach { case (cid, dc, ac) => b.write(cid); b.write((dc << 4) | ac) }
      b.write(ss); b.write(se); b.write((ah << 4) | al)
      seg(0xDA, b.toByteArray)
    }

    private val progComps = Seq((1, 0, 0), (2, 1, 1), (3, 1, 1))

    /** DC first scan (interleaved): DPCM over the POINT-TRANSFORMED
      * values (arithmetic shift — T.81's DC transform). */
    private def scanDcFirst(id: Long, al: Int): Array[Byte] = {
      val (wB, hB) = (wBlocks(id), hBlocks(id))
      val w = new BitWriter
      var (pY, pCb, pCr) = (0, 0, 0)
      (0 until hB).foreach { by =>
        (0 until wB).foreach { bx =>
          def put(dc: Int, pred: Int): Int = {
            val v = dc >> al
            writeCoef(w, dcCodes, bitSize(v - pred), v - pred, bitSize(v - pred))
            v
          }
          pY = put(dcY(id, bx, by), pY)
          pCb = put(dcCb(id, bx, by), pCb)
          pCr = put(dcCr(id, bx, by), pCr)
        }
      }
      w.flush(); w.bytes
    }

    /** DC refinement scan: one raw bit per block per component — bit
      * `al` of the two's-complement coefficient (OR-reconstruction). */
    private def scanDcRefine(id: Long, al: Int): Array[Byte] = {
      val (wB, hB) = (wBlocks(id), hBlocks(id))
      val w = new BitWriter
      (0 until hB).foreach { by =>
        (0 until wB).foreach { bx =>
          w.write((dcY(id, bx, by) >> al) & 1, 1)
          w.write((dcCb(id, bx, by) >> al) & 1, 1)
          w.write((dcCr(id, bx, by) >> al) & 1, 1)
        }
      }
      w.flush(); w.bytes
    }

    /** AC first scan for the luma band [ss, se] at point transform
      * `al` (magnitude shift — T.81's AC transform), with cross-block
      * EOB runs emitted deferred (the libjpeg pattern: the decoder
      * reads the run's code while entering its first covered block). */
    private def scanAcFirstY(id: Long, al: Int, ss: Int, se: Int): Array[Byte] = {
      val (wB, hB) = (wBlocks(id), hBlocks(id))
      val w = new BitWriter
      var pending = 0
      def flushEob(): Unit = if (pending > 0) {
        var r = 0
        while ((2 << r) <= pending) r += 1
        writeCoef(w, acProgCodes, r << 4, 0, 0)
        if (r > 0) w.write(pending - (1 << r), r)
        pending = 0
      }
      (0 until hB).foreach { by =>
        (0 until wB).foreach { bx =>
          val a = acY(id, bx, by)
          val t1 = if (a < 0) -((-a) >> al) else a >> al
          // the one AC lives at zigzag 1 — inside the band only if ss==1
          if (ss == 1 && t1 != 0) {
            flushEob()
            writeCoef(w, acProgCodes, bitSize(t1), t1, bitSize(t1))
            if (se > 1) pending += 1 // the block's tail still needs its EOB
          } else pending += 1
          if (pending == 15) flushEob()
        }
      }
      flushEob()
      w.flush(); w.bytes
    }

    /** AC refinement scan for luma [ss, se], prior Al = al + 1:
      * correction bits for history-nonzero coefficients ride the EOB
      * run they are covered by (buffered, emitted after the run's code
      * — exactly the order the decoder's tail pass reads them); blocks
      * whose coefficient first becomes visible at this Al emit a new
      * ±1<<al value. */
    private def scanAcRefineY(id: Long, al: Int, ss: Int, se: Int): Array[Byte] = {
      val (wB, hB) = (wBlocks(id), hBlocks(id))
      val w = new BitWriter
      var pending = 0
      var buffered = List.empty[Int]
      def flushEob(): Unit = if (pending > 0) {
        var r = 0
        while ((2 << r) <= pending) r += 1
        writeCoef(w, acProgCodes, r << 4, 0, 0)
        if (r > 0) w.write(pending - (1 << r), r)
        buffered.reverse.foreach(bit => w.write(bit, 1))
        pending = 0; buffered = Nil
      }
      (0 until hB).foreach { by =>
        (0 until wB).foreach { bx =>
          val a = acY(id, bx, by)
          val hist = math.abs(a) >> (al + 1)
          if (ss == 1 && hist != 0) {
            // history-nonzero: this block is EOB-covered, its correction
            // bit buffered onto the covering run
            pending += 1
            buffered = ((math.abs(a) >> al) & 1) :: buffered
          } else if (ss == 1 && (math.abs(a) >> al) == 1) {
            flushEob()
            writeCoef(w, acProgCodes, 0x01, 0, 0) // run 0, size 1
            w.write(if (a > 0) 1 else 0, 1)       // sign bit (1 = +1<<al)
            if (se > 1) pending += 1
          } else pending += 1
          if (pending == 15) flushEob()
        }
      }
      flushEob()
      w.flush(); w.bytes
    }

    def payloadProg(id: Long, text: String): Array[Byte] = (id % 4) match {
      case 0 => // successive approximation: first passes at Al=1, then
        // DC and AC refinement scans restore bit 0
        Soi ++ dqt ++ sof2(id) ++ dhtProg ++
          sosProg(progComps, 0, 0, 0, 1) ++ scanDcFirst(id, 1) ++
          sosProg(progComps.take(1), 1, 63, 0, 1) ++ scanAcFirstY(id, 1, 1, 63) ++
          sosProg(progComps, 0, 0, 1, 0) ++ scanDcRefine(id, 0) ++
          sosProg(progComps.take(1), 1, 63, 1, 0) ++ scanAcRefineY(id, 0, 1, 63) ++
          Eoi
      case 1 => // spectral selection: DC, then AC split into [1,1] and
        // the all-empty [2,63] band — cross-block EOB runs throughout
        Soi ++ dqt ++ sof2(id) ++ dhtProg ++
          sosProg(progComps, 0, 0, 0, 0) ++ scanDcFirst(id, 0) ++
          sosProg(progComps.take(1), 1, 1, 0, 0) ++ scanAcFirstY(id, 0, 1, 1) ++
          sosProg(progComps.take(1), 2, 63, 0, 0) ++ scanAcFirstY(id, 0, 2, 63) ++
          Eoi
      case 2 => // truncated mid-scan: decode must fail closed
        val full = scanDcFirst(id, 0)
        Soi ++ dqt ++ sof2(id) ++ dhtProg ++ sosProg(progComps, 0, 0, 0, 0) ++
          full.take(math.max(1, full.length / 2))
      case _ => // opaque non-image payload
        Array[Byte](0) ++ text.getBytes("UTF-8")
    }

    /** Handcrafted single-block progressive payload exercising the ZRL
      * path of the AC first scan (the one branch the generative
      * construction never reaches — its AC lives at zigzag 1): a luma
      * DC, then 16 zigzag zeros skipped by ZRL, then an AC at zigzag 17
      * (natural (u=3, v=2)), then EOB. The spec pins the decode against
      * the two-coefficient scalar closed form. */
    private[graft] def handcraftedProgZrl(dc: Int, ac17: Int): Array[Byte] = {
      val dcScan = {
        val w = new BitWriter
        writeCoef(w, dcCodes, bitSize(dc), dc, bitSize(dc))
        writeCoef(w, dcCodes, 0, 0, 0) // Cb dc = 0
        writeCoef(w, dcCodes, 0, 0, 0) // Cr dc = 0
        w.flush(); w.bytes
      }
      val acScan = {
        val w = new BitWriter
        writeCoef(w, acProgCodes, 0xF0, 0, 0) // ZRL: skip zigzag 1..16
        writeCoef(w, acProgCodes, bitSize(ac17), ac17, bitSize(ac17)) // k=17
        writeCoef(w, acProgCodes, 0x00, 0, 0) // EOB for 18..63
        w.flush(); w.bytes
      }
      // id 12 declares an 8x8 single-block frame
      Soi ++ dqt ++ sof2(12L) ++ dhtProg ++
        sosProg(progComps, 0, 0, 0, 0) ++ dcScan ++
        sosProg(progComps.take(1), 1, 63, 0, 0) ++ acScan ++ Eoi
    }

    /** Malformed progressive payloads for the fail-closed spec. */
    private[graft] def malformedProg(kind: String): Array[Byte] = kind match {
      case "prog420" => // progressive + subsampling: unsupported layout
        val (w, h) = (16, 16)
        Soi ++ dqt ++ seg(0xC2, Array[Byte](8,
          ((h >> 8) & 0xFF).toByte, (h & 0xFF).toByte,
          ((w >> 8) & 0xFF).toByte, (w & 0xFF).toByte,
          3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)) ++ dhtProg ++
          sosProg(progComps, 0, 0, 0, 0) ++ Eoi
      case "ac_interleaved" => // AC scan with 3 components: invalid
        Soi ++ dqt ++ sof2(4L) ++ dhtProg ++
          sosProg(progComps, 1, 63, 0, 0) ++ Eoi
      case "refine_size2" => // AC refinement with size 2: invalid
        val w = new BitWriter
        writeCoef(w, acProgCodes, 0x02, 1, 2)
        w.flush()
        Soi ++ dqt ++ sof2(4L) ++ dhtProg ++
          sosProg(progComps, 0, 0, 0, 0) ++ scanDcFirst(4L, 0) ++
          sosProg(progComps.take(1), 1, 63, 1, 0) ++ w.bytes ++ Eoi
      case _ => Array[Byte](0)
    }
  }

  /** Decoded whole-image statistics. */
  private[graft] case class JpegStats(w: Long, h: Long, nPx: Long,
      nBlocks: Long, sumR: Long, sumG: Long, sumB: Long, ysumLum: Long)

  /** Shared float constants — the SAME Scala doubles are interpolated
    * into the oracle SQL, so engine and oracle arithmetic is
    * bit-identical by construction. */
  private[graft] val InvSqrt2: Double = 1.0 / math.sqrt(2.0)
  private[graft] val CosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16.0))

  private[graft] val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** The real generic baseline decoder. */
  private[graft] object JpegPixelDecoder extends Binary.PayloadDecoder[JpegStats] {
    val format = "jpeg"

    private final class Tables {
      val quant = new Array[Array[Int]](4)
      // huffman: per (class, id): mincode/maxcode/valptr + values
      val huff = new Array[(Array[Int], Array[Int], Array[Int], Array[Int])](8)
      var w = 0; var h = 0
      var compQ: Array[Int] = _ // per component: quant table id
      var compId: Array[Int] = _ // per component: the SOF-declared id
      var compH: Array[Int] = _ // per component: sampling factors
      var compV: Array[Int] = _
      var compDc: Array[Int] = _
      var compAc: Array[Int] = _
      var restartInterval = 0
      var progressive = false
      // progressive: per-component raw coefficient store (natural
      // order, 64 per block, block-raster), filled across scans and
      // dequantized + IDCT'd at EOI
      var coefStore: Array[Array[Int]] = _
      var sawScan = false
      def hMax: Int = compH.max
      def vMax: Int = compV.max
    }

    private def buildHuff(bits: Array[Int], vals: Array[Int]) = {
      val (mincode, maxcode, valptr) =
        (new Array[Int](17), Array.fill(17)(-1), new Array[Int](17))
      var code = 0; var vi = 0
      (1 to 16).foreach { len =>
        if (bits(len - 1) > 0) {
          valptr(len) = vi
          mincode(len) = code
          code += bits(len - 1); vi += bits(len - 1)
          maxcode(len) = code - 1
        }
        code <<= 1
      }
      (mincode, maxcode, valptr, vals)
    }

    def decode(b: Array[Byte]): Option[JpegStats] = {
      try decode0(b) catch { case _: Exception => None }
    }

    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
    private def be16(b: Array[Byte], i: Int): Int =
      (u8(b, i) << 8) | u8(b, i + 1)

    private def decode0(b: Array[Byte]): Option[JpegStats] = {
      if (b.length < 4 || u8(b, 0) != 0xFF || u8(b, 1) != 0xD8) return None
      val t = new Tables
      var i = 2
      while (i + 2 <= b.length) {
        if (u8(b, i) != 0xFF) return None
        val m = u8(b, i + 1)
        if (m == 0xD9) // EOI: a progressive frame finishes HERE (its
          // scans accumulated coefficients); before any scan it is junk
          return if (t.progressive && t.sawScan) finishProgressive(t)
            else None
        if (i + 4 > b.length) return None
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        val (ps, pe) = (i + 4, i + 2 + len)
        var nextI = pe
        m match {
          case 0xDB => // DQT: one or more tables
            var p = ps
            while (p < pe) {
              val pq = u8(b, p) >> 4
              val tq = u8(b, p) & 0x0F
              if (pq != 0 || tq > 3 || p + 65 > pe) return None
              t.quant(tq) = (1 to 64).map(k => u8(b, p + k)).toArray
              p += 65
            }
          case 0xC4 => // DHT: one or more tables
            var p = ps
            while (p < pe) {
              val cls = u8(b, p) >> 4
              val tid = u8(b, p) & 0x0F
              if (cls > 1 || tid > 3) return None
              val bits = (1 to 16).map(k => u8(b, p + k)).toArray
              val n = bits.sum
              if (p + 17 + n > pe) return None
              val vals = (0 until n).map(k => u8(b, p + 17 + k)).toArray
              t.huff(cls * 4 + tid) = buildHuff(bits, vals)
              p += 17 + n
            }
          case 0xC0 | 0xC2 => // SOF0 baseline / SOF2 progressive
            if (u8(b, ps) != 8) return None
            t.progressive = m == 0xC2
            t.h = be16(b, ps + 1); t.w = be16(b, ps + 3)
            val nc = u8(b, ps + 5)
            if (nc != 3 || t.w == 0 || t.h == 0) return None
            t.compQ = new Array[Int](3); t.compId = new Array[Int](3)
            t.compH = new Array[Int](3); t.compV = new Array[Int](3)
            (0 until 3).foreach { c =>
              t.compId(c) = u8(b, ps + 6 + 3 * c)
              val samp = u8(b, ps + 6 + 3 * c + 1)
              t.compH(c) = samp >> 4; t.compV(c) = samp & 0x0F
              t.compQ(c) = u8(b, ps + 6 + 3 * c + 2)
            }
            // supported layouts: 4:4:4 (all 1x1) and, for baseline,
            // 4:2:0 (luma 2x2, chroma 1x1); anything else fails closed.
            // Dimensions are arbitrary — the scan decodes the CEIL MCU
            // grid (T.81: edge MCUs are coded in full) and the stats
            // walk clips to the declared width/height
            val s444 = (0 until 3).forall(c => t.compH(c) == 1 && t.compV(c) == 1)
            val s420 = t.compH(0) == 2 && t.compV(0) == 2 &&
              (1 until 3).forall(c => t.compH(c) == 1 && t.compV(c) == 1)
            if (t.progressive) { if (!s444) return None }
            else if (!s444 && !s420) return None
          case 0xC1 | 0xC3 | 0xC5 | 0xC6 | 0xC7 |
               0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
            return None // non-baseline/progressive frame: fail closed
          case 0xDD =>
            t.restartInterval = be16(b, ps)
          case 0xDA if !t.progressive => // baseline SOS: one scan, done
            val nc = u8(b, ps)
            if (nc != 3 || t.compQ == null) return None
            t.compDc = new Array[Int](3); t.compAc = new Array[Int](3)
            (0 until 3).foreach { c =>
              t.compDc(c) = u8(b, ps + 2 + 2 * c) >> 4
              t.compAc(c) = u8(b, ps + 2 + 2 * c) & 0x0F
            }
            return decodeScan(b, pe, t)
          case 0xDA => // progressive SOS: one of several scans
            val nc = u8(b, ps)
            if (nc < 1 || nc > 3 || t.compQ == null) return None
            if (t.compDc == null) {
              t.compDc = new Array[Int](3); t.compAc = new Array[Int](3)
            }
            if (t.coefStore == null) {
              val nBlk = ((t.w + 7) / 8) * ((t.h + 7) / 8)
              t.coefStore = Array.fill(3)(new Array[Int](nBlk * 64))
            }
            val comps = new Array[Int](nc)
            (0 until nc).foreach { j =>
              val cid = u8(b, ps + 1 + 2 * j)
              val idx = t.compId.indexOf(cid)
              if (idx < 0) return None
              comps(j) = idx
              t.compDc(idx) = u8(b, ps + 2 + 2 * j) >> 4
              t.compAc(idx) = u8(b, ps + 2 + 2 * j) & 0x0F
            }
            val ss = u8(b, ps + 1 + 2 * nc)
            val se = u8(b, ps + 2 + 2 * nc)
            val ahal = u8(b, ps + 3 + 2 * nc)
            nextI = decodeProgScan(b, pe, t, comps, ss, se,
              ahal >> 4, ahal & 0x0F)
            t.sawScan = true
          case x if x >= 0xE0 && x <= 0xEF => () // APPn: skip
          case 0xFE => () // COM: skip
          case _ => return None
        }
        i = nextI
      }
      None
    }

    /** MSB-first entropy reader with 0xFF00 unstuffing. A marker byte
      * encountered as DATA (RSTn out of place, EOI mid-MCU, garbage) is
      * a decode error — restarts are consumed explicitly by the scan
      * loop at MCU boundaries, never here. */
    private final class BitReader(b: Array[Byte], var pos: Int) {
      private var acc = 0
      private var nbits = 0
      /** Drop the pad bits of a flushed byte (marker boundary). */
      def align(): Unit = { acc = 0; nbits = 0 }
      def bit(): Int = {
        if (nbits == 0) {
          if (pos >= b.length) throw new java.io.EOFException
          val v = b(pos) & 0xFF
          pos += 1
          if (v == 0xFF) {
            if (pos >= b.length) throw new java.io.EOFException
            if ((b(pos) & 0xFF) != 0x00) throw new java.io.EOFException
            pos += 1 // stuffed zero
          }
          acc = v; nbits = 8
        }
        nbits -= 1
        (acc >> nbits) & 1
      }
      def bits(n: Int): Int = {
        var v = 0; var k = 0
        while (k < n) { v = (v << 1) | bit(); k += 1 }
        v
      }
    }

    private def decodeHuff(r: BitReader,
        tab: (Array[Int], Array[Int], Array[Int], Array[Int])): Int = {
      val (mincode, maxcode, valptr, vals) = tab
      var code = 0
      var len = 0
      while (len < 16) {
        code = (code << 1) | r.bit()
        len += 1
        if (maxcode(len) >= 0 && code <= maxcode(len) && code >= mincode(len))
          return vals(valptr(len) + code - mincode(len))
      }
      throw new java.io.EOFException // invalid code
    }

    private def extend(v: Int, s: Int): Int =
      if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

    private def decodeScan(b: Array[Byte], start: Int,
        t: Tables): Option[JpegStats] = {
      val (hMax, vMax) = (t.hMax, t.vMax)
      // CEIL MCU grid: edge MCUs are coded in full (T.81), the padding
      // samples exist in the planes and the stats walk clips them off
      val wMcu = (t.w + 8 * hMax - 1) / (8 * hMax)
      val hMcu = (t.h + 8 * vMax - 1) / (8 * vMax)
      val r = new BitReader(b, start)
      val preds = new Array[Int](3)
      // decoded samples per COMPONENT plane at that component's own
      // resolution (chroma planes are smaller under subsampling),
      // PADDED to the MCU grid; full planes are fine — images are
      // small by contract of the decode seam: one row's payload
      val planeW = (0 until 3).map(c => wMcu * 8 * t.compH(c)).toArray
      val planeH = (0 until 3).map(c => hMcu * 8 * t.compV(c)).toArray
      val planes = (0 until 3).map(c => new Array[Int](planeW(c) * planeH(c)))
        .toArray
      val coef = new Array[Int](64)
      var mcu = 0
      val nMcu = wMcu * hMcu
      var sinceRestart = 0
      while (mcu < nMcu) {
        if (t.restartInterval > 0 && sinceRestart == t.restartInterval) {
          // the encoder flushed to a byte boundary and emitted RSTn:
          // drop pad bits, consume the marker, reset the DC predictors
          r.align()
          if (r.pos + 1 >= b.length || (b(r.pos) & 0xFF) != 0xFF)
            return None
          val nxt = b(r.pos + 1) & 0xFF
          if (nxt < 0xD0 || nxt > 0xD7) return None
          r.pos += 2
          preds(0) = 0; preds(1) = 0; preds(2) = 0
          sinceRestart = 0
        }
        val (mx, my) = (mcu % wMcu, mcu / wMcu)
        var c = 0
        while (c < 3) {
          val dcTab = t.huff(0 * 4 + t.compDc(c))
          val acTab = t.huff(1 * 4 + t.compAc(c))
          val q = t.quant(t.compQ(c))
          if (dcTab == null || acTab == null || q == null) return None
          // the T.81 interleave: within the MCU a component contributes
          // H x V blocks, raster order (v outer, h inner); the DC
          // predictor chains across ALL the component's blocks in scan
          // order, intra-MCU included
          var vv = 0
          while (vv < t.compV(c)) {
            var hh = 0
            while (hh < t.compH(c)) {
              java.util.Arrays.fill(coef, 0)
              val s = decodeHuff(r, dcTab)
              val diff = extend(r.bits(s), s)
              preds(c) += diff
              coef(0) = preds(c) * q(0)
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = decodeHuff(r, acTab)
                val (run, size) = (rs >> 4, rs & 0x0F)
                if (rs == 0x00) eob = true
                else if (rs == 0xF0) k += 16
                else {
                  k += run
                  if (k > 63) return None
                  coef(ZigZag(k)) = extend(r.bits(size), size) * q(k)
                  k += 1
                }
              }
              // full float IDCT + level shift + clamp
              idctInto(coef, planes(c), planeW(c),
                (mx * t.compH(c) + hh) * 8, (my * t.compV(c) + vv) * 8)
              hh += 1
            }
            vv += 1
          }
          c += 1
        }
        mcu += 1
        sinceRestart += 1
      }
      statsOf(t, planes, planeW, nMcu.toLong)
    }

    /** Full float IDCT + level shift + clamp of one block of DEQUANTIZED
      * natural-order coefficients into a component plane. */
    private def idctInto(coef: Array[Int], plane: Array[Int], planeW: Int,
        ox: Int, oy: Int): Unit = {
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var s2 = 0.0
          var v = 0
          while (v < 8) {
            var u = 0
            while (u < 8) {
              val f = coef(v * 8 + u)
              if (f != 0) {
                val au = if (u == 0) InvSqrt2 else 1.0
                val av = if (v == 0) InvSqrt2 else 1.0
                s2 += ((au * av) * f) * CosT(x)(u) * CosT(y)(v)
              }
              u += 1
            }
            v += 1
          }
          val samp = math.floor(0.25 * s2 + 128.0 + 0.5)
          val px = math.max(0.0, math.min(255.0, samp)).toInt
          plane((oy + y) * planeW + (ox + x)) = px
          x += 1
        }
        y += 1
      }
    }

    /** Chroma upsampling (JFIF box replication: luma (x, y) reads
      * chroma (x*Hc/Hmax, y*Vc/Vmax)) + BT.601 YCbCr -> RGB and the
      * whole-image stats, clipped to the declared dimensions. */
    private def statsOf(t: Tables, planes: Array[Array[Int]],
        planeW: Array[Int], nUnits: Long): Option[JpegStats] = {
      val (hMax, vMax) = (t.hMax, t.vMax)
      var (sr, sg, sb, ysum) = (0L, 0L, 0L, 0L)
      var y = 0
      while (y < t.h) {
        var x = 0
        while (x < t.w) {
          val yy = planes(0)(y * planeW(0) + x).toDouble
          val cb = planes(1)((y * t.compV(1) / vMax) * planeW(1)
            + (x * t.compH(1) / hMax)).toDouble
          val cr = planes(2)((y * t.compV(2) / vMax) * planeW(2)
            + (x * t.compH(2) / hMax)).toDouble
          def clamp(d: Double): Long =
            math.max(0.0, math.min(255.0, d)).toLong
          val rr = clamp(math.floor(yy + 1.402 * (cr - 128.0) + 0.5))
          val gg = clamp(math.floor(
            yy - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5))
          val bb = clamp(math.floor(yy + 1.772 * (cb - 128.0) + 0.5))
          sr += rr; sg += gg; sb += bb
          ysum += y.toLong * (rr + gg + bb)
          x += 1
        }
        y += 1
      }
      Some(JpegStats(t.w.toLong, t.h.toLong, (t.w.toLong * t.h),
        nUnits, sr, sg, sb, ysum))
    }

    // ---- progressive scans (SOF2): coefficients accumulate across
    // scans in t.coefStore; dequantization + IDCT happen at EOI ----

    /** Advance past the scan's entropy data to the next marker. */
    private def nextMarker(b: Array[Byte], from: Int): Int = {
      var p = from
      while (p + 1 < b.length) {
        if ((b(p) & 0xFF) == 0xFF && (b(p + 1) & 0xFF) != 0x00) return p
        p += 1
      }
      throw new java.io.EOFException
    }

    /** One progressive scan: a DC scan (Ss = Se = 0) walks the MCU
      * grid interleaved over the scan's components (first pass = DPCM
      * over the point-transformed values, refinement = one appended bit
      * per block); an AC scan (Ss >= 1) covers ONE component's blocks
      * in raster order over the spectral band with EOB-run state.
      * Returns the stream position of the next marker. */
    private def decodeProgScan(b: Array[Byte], start: Int, t: Tables,
        comps: Array[Int], ss: Int, se: Int, ah: Int, al: Int): Int = {
      val r = new BitReader(b, start)
      // 4:4:4 progressive: the block grid IS the MCU grid
      val wB = (t.w + 7) / 8
      val hB = (t.h + 7) / 8
      val nBlk = wB * hB
      if (ss == 0) {
        if (se != 0 || al > 13) throw new java.io.EOFException
        val preds = new Array[Int](comps.length)
        var blk = 0
        var sinceRestart = 0
        while (blk < nBlk) {
          if (t.restartInterval > 0 && sinceRestart == t.restartInterval) {
            r.align()
            if (r.pos + 1 >= b.length || (b(r.pos) & 0xFF) != 0xFF)
              throw new java.io.EOFException
            val nxt = b(r.pos + 1) & 0xFF
            if (nxt < 0xD0 || nxt > 0xD7) throw new java.io.EOFException
            r.pos += 2
            java.util.Arrays.fill(preds, 0)
            sinceRestart = 0
          }
          var j = 0
          while (j < comps.length) {
            val c = comps(j)
            val off = blk * 64
            if (ah == 0) {
              val dcTab = t.huff(t.compDc(c))
              if (dcTab == null) throw new java.io.EOFException
              val sVal = decodeHuff(r, dcTab)
              preds(j) += extend(r.bits(sVal), sVal)
              t.coefStore(c)(off) = preds(j) << al
            } else if (r.bit() == 1)
              t.coefStore(c)(off) |= (1 << al)
            j += 1
          }
          blk += 1
          sinceRestart += 1
        }
      } else {
        // AC scan: T.81 requires exactly one component, band inside 1..63
        if (comps.length != 1 || ss > se || se > 63)
          throw new java.io.EOFException
        val c = comps(0)
        val acTab = t.huff(4 + t.compAc(c))
        if (acTab == null) throw new java.io.EOFException
        var eobrun = 0
        var blk = 0
        while (blk < nBlk) {
          eobrun =
            if (ah == 0) acFirstBlock(r, acTab, t.coefStore(c), blk * 64,
              ss, se, al, eobrun)
            else acRefineBlock(r, acTab, t.coefStore(c), blk * 64,
              ss, se, al, eobrun)
          blk += 1
        }
      }
      nextMarker(b, r.pos)
    }

    /** AC first pass over one block's band: baseline run/size coding
      * with the point-transform shift and EOB RUNS (an EOB code with
      * run r ends this block and skips (1<<r)+extra-1 FOLLOWING
      * blocks). */
    private def acFirstBlock(r: BitReader,
        tab: (Array[Int], Array[Int], Array[Int], Array[Int]),
        arr: Array[Int], off: Int, ss: Int, se: Int, al: Int,
        eobrunIn: Int): Int = {
      if (eobrunIn > 0) return eobrunIn - 1
      var k = ss
      while (k <= se) {
        val rs = decodeHuff(r, tab)
        val (run, size) = (rs >> 4, rs & 0x0F)
        if (size == 0) {
          if (run < 15)
            return (1 << run) + (if (run > 0) r.bits(run) else 0) - 1
          k += 16 // ZRL
        } else {
          k += run
          if (k > se) throw new java.io.EOFException
          arr(off + ZigZag(k)) = extend(r.bits(size), size) << al
          k += 1
        }
      }
      0
    }

    /** AC refinement pass over one block's band (the T.81/G.1.2.3
      * correction-bit walk): history-nonzero coefficients read one
      * correction bit wherever the walk passes them — while advancing
      * toward a newly visible +-1<<Al coefficient, and across the tail
      * of EOB-run-covered blocks. */
    private def acRefineBlock(r: BitReader,
        tab: (Array[Int], Array[Int], Array[Int], Array[Int]),
        arr: Array[Int], off: Int, ss: Int, se: Int, al: Int,
        eobrunIn: Int): Int = {
      val p1 = 1 << al
      val m1 = -1 << al
      var eobrun = eobrunIn
      var k = ss
      def corrBit(z: Int): Unit =
        if (r.bit() == 1 && (arr(off + z) & p1) == 0)
          arr(off + z) += (if (arr(off + z) >= 0) p1 else m1)
      if (eobrun == 0) {
        var ended = false
        while (k <= se && !ended) {
          val rs = decodeHuff(r, tab)
          var run = rs >> 4
          val size = rs & 0x0F
          var newVal = 0
          if (size == 0) {
            if (run < 15) {
              eobrun = (1 << run) + (if (run > 0) r.bits(run) else 0)
              ended = true
            }
            // run == 15 (ZRL): skip 16 zero-history coefficients
          } else {
            if (size != 1) throw new java.io.EOFException
            newVal = if (r.bit() == 1) p1 else m1
          }
          if (!ended) {
            var placed = false
            while (k <= se && !placed) {
              val z = ZigZag(k)
              if (arr(off + z) != 0) corrBit(z)
              else if (run == 0) {
                if (newVal != 0) arr(off + z) = newVal
                placed = true
              } else run -= 1
              k += 1
            }
          }
        }
      }
      if (eobrun > 0) {
        // the EOB run's tail: correction bits for the REMAINING
        // history-nonzero coefficients of this block
        while (k <= se) {
          val z = ZigZag(k)
          if (arr(off + z) != 0) corrBit(z)
          k += 1
        }
        eobrun - 1
      } else 0
    }

    /** EOI of a progressive frame: dequantize the accumulated
      * coefficients, IDCT every block, and run the shared stats walk. */
    private def finishProgressive(t: Tables): Option[JpegStats] = {
      val wB = (t.w + 7) / 8
      val hB = (t.h + 7) / 8
      val planeW = Array.fill(3)(wB * 8)
      val planes = Array.fill(3)(new Array[Int](wB * 8 * hB * 8))
      val coef = new Array[Int](64)
      var c = 0
      while (c < 3) {
        val q = t.quant(t.compQ(c))
        if (q == null) return None
        var blk = 0
        while (blk < wB * hB) {
          var k = 0
          while (k < 64) {
            // the store is natural-order; quant tables are zigzag-order
            coef(ZigZag(k)) = t.coefStore(c)(blk * 64 + ZigZag(k)) * q(k)
            k += 1
          }
          idctInto(coef, planes(c), planeW(c), (blk % wB) * 8, (blk / wB) * 8)
          blk += 1
        }
        c += 1
      }
      statsOf(t, planes, planeW, (wB * hB).toLong)
    }
  }

  def q119JpegPixels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { batch =>
        batch.map { case (id, text) =>
          val bytes = JpegBytes.payload(id, text)
          JpegPixelDecoder.decode(bytes) match {
            case Some(st) =>
              (id, JpegPixelDecoder.format, Option(st.w),
                Option(st.h), Option(st.nPx), Option(st.nBlocks),
                Option(st.sumR), Option(st.sumG), Option(st.sumB),
                Option(st.ysumLum))
            case None =>
              (id, "unknown", None: Option[Long],
                None: Option[Long], None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long], None: Option[Long],
                None: Option[Long])
          }
        }
      }
      .toDF("doc_id", "format", "img_w", "img_h", "n_px",
        "n_blocks", "sum_r", "sum_g", "sum_b", "ysum_lum")
      .orderBy(col("doc_id"))
  }

  /** q119b: 4:2:0 CHROMA-SUBSAMPLED baseline decode — the sampling
    * layout real-world JPEGs overwhelmingly use, and the part q119's
    * 4:4:4 tier does not exercise: multi-block MCUs (four luma blocks
    * + one block per chroma plane, T.81 interleave order with the DC
    * predictor chained across a component's intra-MCU blocks) and
    * CHROMA UPSAMPLING (each chroma sample covers a 2x2 luma patch —
    * JFIF box replication). The construction gates each mechanism:
    * four DIFFERENT luma DCs per MCU catch block misplacement or a
    * wrong interleave through the y-moment, and a horizontal-frequency
    * chroma AC catches wrong replication (x vs x/2) through the
    * channel sums. Same bit-parity discipline as q119. */
  def q119bJpegSubsampled(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { batch =>
        batch.map { case (id, text) =>
          val bytes = JpegBytes.payload420(id, text)
          JpegPixelDecoder.decode(bytes) match {
            case Some(st) =>
              (id, JpegPixelDecoder.format, Option(st.w),
                Option(st.h), Option(st.nPx), Option(st.nBlocks),
                Option(st.sumR), Option(st.sumG), Option(st.sumB),
                Option(st.ysumLum))
            case None =>
              (id, "unknown", None: Option[Long],
                None: Option[Long], None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long], None: Option[Long],
                None: Option[Long])
          }
        }
      }
      .toDF("doc_id", "format", "img_w", "img_h", "n_px",
        "n_mcus", "sum_r", "sum_g", "sum_b", "ysum_lum")
      .orderBy(col("doc_id"))
  }

  /** q119c: EDGE-CLIPPED baseline decode — arbitrary declared
    * dimensions, the last structural piece of real-world baseline JPEG
    * q119/q119b's full-MCU images never exercise: the entropy stream
    * codes the CEIL MCU grid in full (T.81 — edge blocks are not
    * truncated on the wire), and the decoder must CLIP the decoded
    * padding to the declared width/height. The construction declares
    * dims 1-7 columns and 0-4 rows short of the block grid over the
    * same per-block coefficients as q119, so summing even one padding
    * column (the x-varying luma AC makes each column distinct) or one
    * padding row (the y-moment weights rows) hash-fails. */
  def q119cJpegEdge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { batch =>
        batch.map { case (id, text) =>
          val bytes = JpegBytes.payloadEdge(id, text)
          JpegPixelDecoder.decode(bytes) match {
            case Some(st) =>
              (id, JpegPixelDecoder.format, Option(st.w),
                Option(st.h), Option(st.nPx), Option(st.nBlocks),
                Option(st.sumR), Option(st.sumG), Option(st.sumB),
                Option(st.ysumLum))
            case None =>
              (id, "unknown", None: Option[Long],
                None: Option[Long], None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long], None: Option[Long],
                None: Option[Long])
          }
        }
      }
      .toDF("doc_id", "format", "img_w", "img_h", "n_px",
        "n_mcus", "sum_r", "sum_g", "sum_b", "ysum_lum")
      .orderBy(col("doc_id"))
  }

  /** q119d: PROGRESSIVE (SOF2) decode — the scan structure that
    * dominates real web JPEGs and the last entropy-coding regime the
    * baseline tiers never exercise: coefficients arrive across MULTIPLE
    * scans (spectral selection splits the zigzag band; successive
    * approximation splits the bit planes), so the decoder accumulates a
    * per-block coefficient store through DC-first DPCM over
    * point-transformed values, one-bit DC refinements, AC first passes
    * with cross-block EOB runs, and the T.81 correction-bit AC
    * refinement walk — and only IDCTs at EOI. The construction reuses
    * q119's per-block coefficients: variant 0 splits them by bit plane
    * (Al=1 first passes + both refinement scans), variant 1 by spectrum
    * (AC band [1,1] then the all-empty [2,63] — long EOB runs), so the
    * fully refined image is BIT-IDENTICAL to the baseline one and
    * q119's oracle gates this tier verbatim. Truncated scans and
    * malformed refinement codes fail closed (JpegSpec). */
  def q119dJpegProgressive(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { batch =>
        batch.map { case (id, text) =>
          val bytes = JpegBytes.payloadProg(id, text)
          JpegPixelDecoder.decode(bytes) match {
            case Some(st) =>
              (id, JpegPixelDecoder.format, Option(st.w),
                Option(st.h), Option(st.nPx), Option(st.nBlocks),
                Option(st.sumR), Option(st.sumG), Option(st.sumB),
                Option(st.ysumLum))
            case None =>
              (id, "unknown", None: Option[Long],
                None: Option[Long], None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long], None: Option[Long],
                None: Option[Long])
          }
        }
      }
      .toDF("doc_id", "format", "img_w", "img_h", "n_px",
        "n_blocks", "sum_r", "sum_g", "sum_b", "ysum_lum")
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "q119_jpeg_pixels" -> (q119JpegPixels _),
    "q119b_jpeg_subsampled" -> (q119bJpegSubsampled _),
    "q119c_jpeg_edge" -> (q119cJpegEdge _),
    "q119d_jpeg_progressive" -> (q119dJpegProgressive _))

  /** The oracle restates the full decode pipeline in closed form. Per
    * block only two luma frequencies exist, so the sample columns are
    * x-dependent only; row sums multiply by 8 and the y-moment by the
    * closed row-index sum (64*by + 28 per block column). The cosine
    * and 1/√2 literals are THE decoder's doubles, interpolated below,
    * and every float expression mirrors the decoder's operation order —
    * hash-exact parity, the q114/q115 discipline. */
  val oracleSql: Map[String, String] = {
    def d17(v: Double): String = {
      val s = java.lang.Double.toString(v)
      if (s.contains("E")) {
        // SQL-friendly exponent form
        s.replace("E", "e")
      } else s
    }
    val c0 = d17(InvSqrt2)
    val cosRows = (0 until 8)
      .map(x => s"($x, CAST(${d17(CosT(x)(1))} AS DOUBLE))").mkString(", ")
    // the progressive tier refines to EXACTLY the baseline coefficients
    // (same variant mapping: %4 in {0,1} decodes, 2 is truncated, 3
    // opaque), so one statement gates both — the driver's hash compare
    // then PROVES progressive ≡ baseline decode, the q107b/q107c move
    val q119Sql =
      s"""WITH p AS (
         |  SELECT doc_id,
         |    1 + (doc_id * 31) % 3 AS wb,
         |    1 + (doc_id * 47) % 2 AS hb
         |  FROM documents),
         |blk AS (
         |  SELECT doc_id, wb, hb, unnest(range(0, wb * hb)) AS m
         |  FROM p WHERE doc_id % 4 <= 1),
         |coefs AS (
         |  SELECT doc_id, wb, hb, m % wb AS bx, m // wb AS by,
         |    ((doc_id + 7 * (m % wb) + 13 * (m // wb)) % 33 - 16) * 8 AS fdy,
         |    ((doc_id + 11 * (m % wb) + 5 * (m // wb)) % 13 - 6) * 9 AS fay,
         |    ((doc_id + 3 * (m % wb) + (m // wb)) % 21 - 10) * 10 AS fcb,
         |    ((doc_id + 5 * (m % wb) + 3 * (m // wb)) % 19 - 9) * 10 AS fcr
         |  FROM blk),
         |cosx(x, c) AS (VALUES $cosRows),
         |px AS (
         |  SELECT doc_id, wb, hb, bx, by, x,
         |    LEAST(255.0, GREATEST(0.0, floor(
         |      0.25 * ((CAST($c0 AS DOUBLE) * CAST($c0 AS DOUBLE))
         |        * CAST(fdy AS DOUBLE)
         |        + (CAST($c0 AS DOUBLE) * CAST(fay AS DOUBLE)) * c)
         |      + 128.0 + 0.5))) AS ys,
         |    LEAST(255.0, GREATEST(0.0, floor(
         |      0.25 * ((CAST($c0 AS DOUBLE) * CAST($c0 AS DOUBLE))
         |        * CAST(fcb AS DOUBLE)) + 128.0 + 0.5))) AS cbs,
         |    LEAST(255.0, GREATEST(0.0, floor(
         |      0.25 * ((CAST($c0 AS DOUBLE) * CAST($c0 AS DOUBLE))
         |        * CAST(fcr AS DOUBLE)) + 128.0 + 0.5))) AS crs
         |  FROM coefs, cosx),
         |rgb AS (
         |  SELECT doc_id, wb, hb, by,
         |    LEAST(255, GREATEST(0, CAST(floor(
         |      ys + CAST(1.402 AS DOUBLE) * (crs - 128.0) + 0.5) AS BIGINT))) AS r,
         |    LEAST(255, GREATEST(0, CAST(floor(
         |      ys - CAST(0.344136 AS DOUBLE) * (cbs - 128.0)
         |         - CAST(0.714136 AS DOUBLE) * (crs - 128.0) + 0.5) AS BIGINT))) AS g,
         |    LEAST(255, GREATEST(0, CAST(floor(
         |      ys + CAST(1.772 AS DOUBLE) * (cbs - 128.0) + 0.5) AS BIGINT))) AS b
         |  FROM px),
         |agg AS (
         |  SELECT doc_id,
         |    8 * sum(r) AS sr, 8 * sum(g) AS sg, 8 * sum(b) AS sb,
         |    sum((64 * by + 28) * (r + g + b)) AS yl
         |  FROM rgb GROUP BY doc_id)
         |SELECT p.doc_id,
         |  CASE WHEN p.doc_id % 4 <= 1 THEN 'jpeg' ELSE 'unknown' END AS format,
         |  CAST(CASE WHEN p.doc_id % 4 <= 1 THEN 8 * wb END AS BIGINT) AS img_w,
         |  CAST(CASE WHEN p.doc_id % 4 <= 1 THEN 8 * hb END AS BIGINT) AS img_h,
         |  CAST(CASE WHEN p.doc_id % 4 <= 1 THEN 64 * wb * hb END AS BIGINT) AS n_px,
         |  CAST(CASE WHEN p.doc_id % 4 <= 1 THEN wb * hb END AS BIGINT) AS n_blocks,
         |  CAST(agg.sr AS BIGINT) AS sum_r,
         |  CAST(agg.sg AS BIGINT) AS sum_g,
         |  CAST(agg.sb AS BIGINT) AS sum_b,
         |  CAST(agg.yl AS BIGINT) AS ysum_lum
         |FROM p LEFT JOIN agg ON p.doc_id = agg.doc_id
         |ORDER BY p.doc_id""".stripMargin
    Map("q119_jpeg_pixels" -> q119Sql,
    "q119d_jpeg_progressive" -> q119Sql,
    // the edge-clip restatement: the q119 per-block closed form with a
    // declared-width column filter (gx < tw) and per-block-row clipped
    // row counts (rc = min(8, th - 8*by)); the y-moment factor becomes
    // rc*8*by + rc*(rc-1)/2 — one padding column or row summed in
    // breaks a channel sum or the moment
    "q119c_jpeg_edge" ->
      s"""WITH p AS (
         |  SELECT doc_id,
         |    1 + (doc_id * 31) % 3 AS wb,
         |    1 + (doc_id * 47) % 2 AS hb,
         |    8 * (1 + (doc_id * 31) % 3) - 1 - (doc_id * 5) % 7 AS tw,
         |    8 * (1 + (doc_id * 47) % 2) - (doc_id * 3) % 5 AS th
         |  FROM documents),
         |blk AS (
         |  SELECT doc_id, wb, hb, tw, th, unnest(range(0, wb * hb)) AS m
         |  FROM p WHERE doc_id % 3 <= 1),
         |coefs AS (
         |  SELECT doc_id, tw, th, m % wb AS bx, m // wb AS by,
         |    ((doc_id + 7 * (m % wb) + 13 * (m // wb)) % 33 - 16) * 8 AS fdy,
         |    ((doc_id + 11 * (m % wb) + 5 * (m // wb)) % 13 - 6) * 9 AS fay,
         |    ((doc_id + 3 * (m % wb) + (m // wb)) % 21 - 10) * 10 AS fcb,
         |    ((doc_id + 5 * (m % wb) + 3 * (m // wb)) % 19 - 9) * 10 AS fcr
         |  FROM blk),
         |cosx(x, c) AS (VALUES $cosRows),
         |px AS (
         |  SELECT doc_id, by, LEAST(8, th - 8 * by) AS rc,
         |    LEAST(255.0, GREATEST(0.0, floor(
         |      0.25 * ((CAST($c0 AS DOUBLE) * CAST($c0 AS DOUBLE))
         |        * CAST(fdy AS DOUBLE)
         |        + (CAST($c0 AS DOUBLE) * CAST(fay AS DOUBLE)) * c)
         |      + 128.0 + 0.5))) AS ys,
         |    LEAST(255.0, GREATEST(0.0, floor(
         |      0.25 * ((CAST($c0 AS DOUBLE) * CAST($c0 AS DOUBLE))
         |        * CAST(fcb AS DOUBLE)) + 128.0 + 0.5))) AS cbs,
         |    LEAST(255.0, GREATEST(0.0, floor(
         |      0.25 * ((CAST($c0 AS DOUBLE) * CAST($c0 AS DOUBLE))
         |        * CAST(fcr AS DOUBLE)) + 128.0 + 0.5))) AS crs
         |  FROM coefs, cosx
         |  WHERE 8 * bx + x < tw),
         |rgb AS (
         |  SELECT doc_id, by, rc,
         |    LEAST(255, GREATEST(0, CAST(floor(
         |      ys + CAST(1.402 AS DOUBLE) * (crs - 128.0) + 0.5) AS BIGINT))) AS r,
         |    LEAST(255, GREATEST(0, CAST(floor(
         |      ys - CAST(0.344136 AS DOUBLE) * (cbs - 128.0)
         |         - CAST(0.714136 AS DOUBLE) * (crs - 128.0) + 0.5) AS BIGINT))) AS g,
         |    LEAST(255, GREATEST(0, CAST(floor(
         |      ys + CAST(1.772 AS DOUBLE) * (cbs - 128.0) + 0.5) AS BIGINT))) AS b
         |  FROM px),
         |agg AS (
         |  SELECT doc_id,
         |    sum(rc * r) AS sr, sum(rc * g) AS sg, sum(rc * b) AS sb,
         |    sum((rc * 8 * by + (rc * (rc - 1)) // 2) * (r + g + b)) AS yl
         |  FROM rgb GROUP BY doc_id)
         |SELECT p.doc_id,
         |  CASE WHEN p.doc_id % 3 <= 1 THEN 'jpeg' ELSE 'unknown' END AS format,
         |  CAST(CASE WHEN p.doc_id % 3 <= 1 THEN tw END AS BIGINT) AS img_w,
         |  CAST(CASE WHEN p.doc_id % 3 <= 1 THEN th END AS BIGINT) AS img_h,
         |  CAST(CASE WHEN p.doc_id % 3 <= 1 THEN tw * th END AS BIGINT) AS n_px,
         |  CAST(CASE WHEN p.doc_id % 3 <= 1 THEN wb * hb END AS BIGINT) AS n_mcus,
         |  CAST(agg.sr AS BIGINT) AS sum_r,
         |  CAST(agg.sg AS BIGINT) AS sum_g,
         |  CAST(agg.sb AS BIGINT) AS sum_b,
         |  CAST(agg.yl AS BIGINT) AS ysum_lum
         |FROM p LEFT JOIN agg ON p.doc_id = agg.doc_id
         |ORDER BY p.doc_id""".stripMargin,
    // the 4:2:0 restatement: luma DC per MCU quadrant (bq = 2*yy + x//8),
    // chroma closed-form at CHROMA x (= x//2 — the upsampling gate),
    // replicated across the MCU's 16 luma columns and 8 rows per
    // quadrant row; 1-MCU-high images so the y-moment factor is
    // (64*yy + 28) per quadrant row
    "q119b_jpeg_subsampled" ->
      s"""WITH p AS (
         |  SELECT doc_id, 1 + (doc_id * 29) % 2 AS wm
         |  FROM documents),
         |mc AS (
         |  SELECT doc_id, wm, unnest(range(0, wm)) AS mx
         |  FROM p WHERE doc_id % 3 <= 1),
         |yyx AS (
         |  SELECT doc_id, wm, mx, unnest(range(0, 2)) AS yy FROM mc),
         |cell AS (
         |  SELECT doc_id, wm, mx, yy, unnest(range(0, 16)) AS x FROM yyx),
         |coefs AS (
         |  SELECT doc_id, wm, mx, yy, x, x // 2 AS cx,
         |    ((doc_id + 9 * mx + 7 * (2 * yy + x // 8)) % 41 - 20) * 8 AS fdy,
         |    ((doc_id + 5 * mx) % 21 - 10) * 10 AS fcb,
         |    ((doc_id + 3 * mx) % 11 - 5) * 11 AS fcba,
         |    ((doc_id + 7 * mx) % 19 - 9) * 10 AS fcr
         |  FROM cell),
         |cosx(cxi, c) AS (VALUES $cosRows),
         |px AS (
         |  SELECT doc_id, wm, yy,
         |    LEAST(255.0, GREATEST(0.0, floor(
         |      0.25 * ((CAST($c0 AS DOUBLE) * CAST($c0 AS DOUBLE))
         |        * CAST(fdy AS DOUBLE)) + 128.0 + 0.5))) AS ys,
         |    LEAST(255.0, GREATEST(0.0, floor(
         |      0.25 * ((CAST($c0 AS DOUBLE) * CAST($c0 AS DOUBLE))
         |        * CAST(fcb AS DOUBLE)
         |        + (CAST($c0 AS DOUBLE) * CAST(fcba AS DOUBLE)) * c)
         |      + 128.0 + 0.5))) AS cbs,
         |    LEAST(255.0, GREATEST(0.0, floor(
         |      0.25 * ((CAST($c0 AS DOUBLE) * CAST($c0 AS DOUBLE))
         |        * CAST(fcr AS DOUBLE)) + 128.0 + 0.5))) AS crs
         |  FROM coefs JOIN cosx ON cx = cxi),
         |rgb AS (
         |  SELECT doc_id, wm, yy,
         |    LEAST(255, GREATEST(0, CAST(floor(
         |      ys + CAST(1.402 AS DOUBLE) * (crs - 128.0) + 0.5) AS BIGINT))) AS r,
         |    LEAST(255, GREATEST(0, CAST(floor(
         |      ys - CAST(0.344136 AS DOUBLE) * (cbs - 128.0)
         |         - CAST(0.714136 AS DOUBLE) * (crs - 128.0) + 0.5) AS BIGINT))) AS g,
         |    LEAST(255, GREATEST(0, CAST(floor(
         |      ys + CAST(1.772 AS DOUBLE) * (cbs - 128.0) + 0.5) AS BIGINT))) AS b
         |  FROM px),
         |agg AS (
         |  SELECT doc_id,
         |    8 * sum(r) AS sr, 8 * sum(g) AS sg, 8 * sum(b) AS sb,
         |    sum((64 * yy + 28) * (r + g + b)) AS yl
         |  FROM rgb GROUP BY doc_id)
         |SELECT p.doc_id,
         |  CASE WHEN p.doc_id % 3 <= 1 THEN 'jpeg' ELSE 'unknown' END AS format,
         |  CAST(CASE WHEN p.doc_id % 3 <= 1 THEN 16 * wm END AS BIGINT) AS img_w,
         |  CAST(CASE WHEN p.doc_id % 3 <= 1 THEN 16 END AS BIGINT) AS img_h,
         |  CAST(CASE WHEN p.doc_id % 3 <= 1 THEN 256 * wm END AS BIGINT) AS n_px,
         |  CAST(CASE WHEN p.doc_id % 3 <= 1 THEN wm END AS BIGINT) AS n_mcus,
         |  CAST(agg.sr AS BIGINT) AS sum_r,
         |  CAST(agg.sg AS BIGINT) AS sum_g,
         |  CAST(agg.sb AS BIGINT) AS sum_b,
         |  CAST(agg.yl AS BIGINT) AS ysum_lum
         |FROM p LEFT JOIN agg ON p.doc_id = agg.doc_id
         |ORDER BY p.doc_id""".stripMargin)
  }
}
