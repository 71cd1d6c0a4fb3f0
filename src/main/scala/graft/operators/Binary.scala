package graft.operators

import graft.{QueryPack, Tables}
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.G multimodal plumbing: treat content as an opaque binary column
  * with typed metadata extraction. The documents table has no raw media,
  * so the binary payload is the UTF-8 encoding of `text` — the Spark-side
  * plumbing (binary column, byte lengths, magic sniff, content digest,
  * STUBBED decode) is real; only the payload is synthetic.
  *
  * STUB: `decode_w`/`decode_h` stand in for an image decoder (the real
  * thing would be a mapInPandas/mapPartitions decode against a media
  * library unavailable in this environment). They are a deterministic
  * function of size and content fingerprint, clearly fake, but typed and
  * partitioned exactly as the real decode output would be. */
object Binary extends QueryPack {

  def q70BinaryMeta(s: SparkSession, dir: String): DataFrame = {
    val bin = col("text").cast("binary")
    val fp = TextOps.polyHash(col("text"), 31L)
    Tables.documents(s, dir)
      .select(col("doc_id"),
        octet_length(bin).cast("long").as("n_bytes"),
        lower(hex(substring(col("text"), 1, 4).cast("binary"))).as("magic_hex"),
        md5(bin).as("content_md5"),
        // STUB decode: deterministic fake dimensions, not a real decoder
        (lit(320L) + pmod(octet_length(bin).cast("long"), lit(32L)) * 16L).as("decode_w"),
        (lit(240L) + pmod(fp, lit(24L)) * 10L).as("decode_h"))
      .orderBy(col("doc_id"))
  }

  /** Typed partition-batched decode seam — the Scala analog of a
    * mapInPandas media decoder: binary payloads stream through
    * mapPartitions in partition-sized batches, the decoder emits a
    * fixed-shape feature vector per item. The decoder BODY is the
    * pluggable [[PayloadDecoder]] seam's stub instance
    * ([[StrideSumDecoder]] — a real deployment swaps in a codec-backed
    * instance, see [[BmpPixelDecoder]]/q114 for the full-payload real
    * implementation this seam carries today); the plumbing — schema,
    * encoders, partitioning, batch iteration — is the real production
    * shape.
    *
    * The feature vector is emitted as 8 scalar columns (f0..f7) rather
    * than one array column: the gate's comparator sorts result columns,
    * and array cells are unsortable there (r02 crash); scalars also make
    * the result oracle-checkable cell by cell. */
  def q71BinaryDecodeBatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          val features = StrideSumDecoder.decode(bytes).get
          (id, bytes.length.toLong, features(0), features(1), features(2),
            features(3), features(4), features(5), features(6), features(7))
        }
      }
      .toDF("doc_id", "n_bytes", "f0", "f1", "f2", "f3", "f4", "f5", "f6", "f7")
      .orderBy(col("doc_id"))
  }

  /** Frame sampling over an opaque media payload: split the byte stream
    * into fixed 64-byte "frames" (the stub stand-in for container frame
    * boundaries — a real demuxer would emit variable-length frames from
    * a codec library unavailable here), keep every 4th frame, and emit
    * per-frame digests + sizes. The Spark-side shape is the real one for
    * video/audio sampling pipelines: generate frame indices per row
    * (posexplode over a sequence — no UDF), slice the binary column,
    * digest per slice; output rows ~ sampled frames, partition-parallel
    * with zero shuffles before the presentation sort. */
  def q72FrameSample(s: SparkSession, dir: String): DataFrame = {
    val frameLen = 64
    val every = 4
    val bin = col("text").cast("binary")
    Tables.documents(s, dir)
      .select(col("doc_id"), bin.as("payload"),
        octet_length(bin).cast("long").as("n_bytes"))
      // empty payloads yield no frames. Without the guard Spark's
      // sequence(0, -1) would emit [0, -1] (start > stop defaults to
      // step -1) while the oracle's range(0, 0) emits nothing.
      .filter(col("n_bytes") > 0)
      .select(col("doc_id"), col("payload"), col("n_bytes"),
        posexplode(sequence(lit(0L),
          ceil(col("n_bytes").cast("double") / frameLen).cast("long") - 1))
          .as(Seq("pos", "frame_idx")))
      .filter(col("frame_idx") % every === 0)
      // expr: functions.substring only takes literal pos; binary input
      // slices BYTES (the media-true semantics)
      .select(col("doc_id"), col("frame_idx"),
        expr(s"substring(payload, cast(frame_idx * $frameLen + 1 as int), $frameLen)")
          .as("frame"))
      .select(col("doc_id"), col("frame_idx"),
        octet_length(col("frame")).cast("long").as("frame_bytes"),
        md5(col("frame")).as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  // ---- q98: REAL image-header decode (the stub seam upgraded) ----

  /** Format-true synthetic payloads: the corpus carries no raw media, so
    * each doc gets a byte payload laid out EXACTLY per the public format
    * specs — PNG (ISO/IEC 15948 §5.2 signature + §11.2.2 IHDR layout)
    * for doc_id % 3 == 0, JPEG/JFIF (ITU-T T.81 §B.2 marker segments,
    * SOF0 frame header) for % 3 == 1, and opaque non-image bytes for
    * % 3 == 2. Header parameters derive from doc_id by integer
    * arithmetic so the ORACLE can state the expected decode output
    * without parsing anything — the oracle mirrors the CONSTRUCTION,
    * the engine runs the real PARSE, and the hash gate closes the loop:
    * a decoder reading the wrong offset/endianness fails the gate. */
  private[graft] object ImageBytes {
    def width(id: Long): Long = 16L + (id * 7919L) % 1017L
    def height(id: Long): Long = 16L + (id * 104729L) % 761L
    /** PNG color type: truecolor (2, 3 channels) / RGBA (6, 4 channels). */
    def pngColorType(id: Long): Int = if (id % 2 == 0) 2 else 6
    /** JPEG component count: YCbCr (3) / grayscale (1). */
    def jpegComponents(id: Long): Int = if (id % 2 == 0) 3 else 1

    private def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    private def be16(v: Long): Array[Byte] =
      Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

    def payload(id: Long, text: String): Array[Byte] = (id % 3) match {
      case 0 =>
        // PNG signature + IHDR chunk (length, type, 13-byte data, CRC —
        // CRC bytes present but unchecked, as header readers do)
        Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
          be32(13) ++ "IHDR".getBytes("US-ASCII") ++
          be32(width(id)) ++ be32(height(id)) ++
          Array[Byte](8, pngColorType(id).toByte, 0, 0, 0) ++
          be32(0)
      case 1 =>
        // SOI, APP0/JFIF, a COM segment (forces the parser to actually
        // WALK segments rather than assume a fixed SOF offset), SOF0
        val ncomp = jpegComponents(id)
        Array[Byte](0xFF.toByte, 0xD8.toByte) ++
          (Array[Byte](0xFF.toByte, 0xE0.toByte) ++ be16(16) ++
            "JFIF\u0000".getBytes("US-ASCII") ++
            Array[Byte](1, 1, 0) ++ be16(72) ++ be16(72) ++ Array[Byte](0, 0)) ++
          (Array[Byte](0xFF.toByte, 0xFE.toByte) ++ be16(7) ++
            "graft".getBytes("US-ASCII")) ++
          (Array[Byte](0xFF.toByte, 0xC0.toByte) ++ be16(8 + 3 * ncomp) ++
            Array[Byte](8) ++ be16(height(id)) ++ be16(width(id)) ++
            Array[Byte](ncomp.toByte) ++
            Array.fill(3 * ncomp)(0x11.toByte))
      case _ =>
        // opaque non-image payload: the decoder must pass it through as
        // 'unknown' with null dimensions, never crash
        text.getBytes("UTF-8")
    }
  }

  /** Pure-JVM image-header decode: sniff the magic, then read the
    * header fields at their spec offsets — PNG IHDR big-endian 32-bit
    * dims + color type, JPEG marker-segment walk to the first SOF frame
    * header (any of the C0–CF frame markers except C4/C8/CC). Returns
    * (format, width, height, channels) with nulls for undecodable
    * payloads; defensive on truncation (no exceptions — a corrupt blob
    * in a 100 TB corpus must degrade to 'unknown', not kill the stage). */
  private[graft] def decodeImageHeader(b: Array[Byte])
      : (String, Option[Long], Option[Long], Option[Long]) = {
    def u8(i: Int): Int = b(i) & 0xFF
    def be16(i: Int): Long = ((u8(i) << 8) | u8(i + 1)).toLong
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3))
    val pngSig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0D, 0x0A, 0x1A, 0x0A)
    if (b.length >= 26 && pngSig.indices.forall(i => u8(i) == pngSig(i)) &&
        (8 until 12).forall(i => u8(i + 4) == "IHDR".charAt(i - 8).toInt)) {
      val channels = u8(25) match {
        case 0 => Some(1L); case 2 => Some(3L); case 3 => Some(1L)
        case 4 => Some(2L); case 6 => Some(4L); case _ => None
      }
      ("png", Some(be32(16)), Some(be32(20)), channels)
    } else if (b.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      // walk FF-marker segments to the first frame header
      var i = 2
      while (i + 9 < b.length && u8(i) == 0xFF) {
        val marker = u8(i + 1)
        val isSof = marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof)
          return ("jpeg", Some(be16(i + 7)), Some(be16(i + 5)), Some(u8(i + 9).toLong))
        i += 2 + be16(i + 2).toInt // segment length counts itself
      }
      ("unknown", None, None, None)
    } else ("unknown", None, None, None)
  }

  // ---- q113: REAL GIF-header decode (the third format family) ----

  /** Format-true synthetic GIF payloads per the public GIF87a/89a spec
    * (CompuServe GIF, 1987/1989: 6-byte signature+version, then the
    * 7-byte Logical Screen Descriptor — little-endian 16-bit dims, a
    * packed byte whose bit 7 flags a Global Color Table and whose low
    * 3 bits size it at 2^(n+1) entries of 3 bytes). Four classes by
    * doc_id % 4 exercise the parser contract:
    *
    *   0 — GIF89a WITH a global color table (the packed-byte decode
    *       and the palette sizing must both be right for n_bytes and
    *       palette_colors to match the construction);
    *   1 — GIF87a without one (flag bit clear ⇒ 0 palette colors,
    *       and the version byte distinguishes 87a from 89a);
    *   2 — truncated (signature + 3 bytes): degrade to 'unknown';
    *   3 — opaque text behind a NUL lead byte (corpus text CAN begin
    *       with the ASCII signature "GIF87a", so the lead byte makes
    *       the class structurally un-parseable — the q105 rule). */
  private[graft] object GifBytes {
    def width(id: Long): Long = 8L + (id * 4391L) % 1200L
    def height(id: Long): Long = 8L + (id * 6869L) % 900L
    /** GCT size field n in [1, 3] ⇒ 2^(n+1) ∈ {4, 8, 16} entries. */
    def gctBits(id: Long): Int = (1L + (id / 4) % 3L).toInt
    def paletteColors(id: Long): Long =
      if (id % 4 == 0) 1L << (gctBits(id) + 1) else 0L

    private def le16(v: Long): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

    def payload(id: Long, text: String): Array[Byte] = (id % 4) match {
      case 0 =>
        val n = gctBits(id)
        "GIF89a".getBytes("US-ASCII") ++
          le16(width(id)) ++ le16(height(id)) ++
          Array[Byte]((0x80 | n).toByte, 0, 0) ++
          Array.fill(3 * (1 << (n + 1)))(0x2A.toByte)
      case 1 =>
        "GIF87a".getBytes("US-ASCII") ++
          le16(width(id)) ++ le16(height(id)) ++
          Array[Byte](0x07, 0, 0)
      case 2 =>
        "GIF89a".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
      case _ =>
        Array[Byte](0) ++ text.getBytes("UTF-8")
    }
  }

  /** Pure-JVM GIF-header decode: verify the signature, accept only the
    * two published versions, read the little-endian screen dimensions
    * and unpack the Global-Color-Table flag + size. Defensive on
    * truncation — anything shorter than signature + screen descriptor
    * degrades to 'unknown'. Returns (format, version, width, height,
    * palette_colors). */
  private[graft] def decodeGifHeader(b: Array[Byte])
      : (String, Option[String], Option[Long], Option[Long], Option[Long]) = {
    val unknown = ("unknown", None, None, None, None)
    def u8(i: Int): Int = b(i) & 0xFF
    def le16(i: Int): Long = (u8(i) | (u8(i + 1) << 8)).toLong
    if (b.length < 13) return unknown
    val sig = new String(b.slice(0, 6), "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return unknown
    val packed = u8(10)
    val colors = if ((packed & 0x80) != 0) 1L << ((packed & 0x07) + 1) else 0L
    ("gif", Some(sig.drop(3)), Some(le16(6)), Some(le16(8)), Some(colors))
  }

  /** q113: typed GIF-header extraction — the third REAL parser of the
    * multimodal family (PNG/JPEG big-endian chunk/marker reads, WAV
    * little-endian chunk walk, and now the GIF packed-bitfield +
    * little-endian screen descriptor). Same closed loop: payloads are
    * format-true per the public spec with parameters derived from
    * doc_id, the engine PARSES, the oracle restates the CONSTRUCTION,
    * and the hash gate catches any wrong offset, endianness, or
    * bitfield decode. Row-local mapPartitions — the q98/q105 scale
    * shape (no shuffle but the presentation sort). */
  def q113GifHeader(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { batch =>
        batch.map { case (id, text) =>
          val bytes = GifBytes.payload(id, text)
          val (fmt, ver, w, h, pc) = decodeGifHeader(bytes)
          (id, bytes.length.toLong, fmt, ver, w, h, pc)
        }
      }
      .toDF("doc_id", "n_bytes", "format", "gif_version", "img_w", "img_h",
        "palette_colors")
      .orderBy(col("doc_id"))
  }

  // ---- q105: REAL audio-header decode (the audio twin of q98) ----

  /** Format-true synthetic WAV payloads per the public RIFF/WAVE spec
    * (Microsoft/IBM "Multimedia Programming Interface and Data
    * Specifications 1.0", 1991: RIFF header + little-endian chunk walk;
    * fmt chunk layout per the PCM common fields). Four payload classes
    * keyed by doc_id % 4 exercise the full parser contract:
    *
    *   0 — canonical 16-bit PCM WAV: RIFF/WAVE + fmt(16) + data;
    *   1 — 8-bit PCM with an ODD-sized JUNK chunk before fmt: forces a
    *       real chunk walk with the spec's even-byte padding rule (a
    *       reader that assumes fmt at offset 12 or forgets the pad byte
    *       desyncs and fails the gate);
    *   2 — truncated RIFF (fmt declared longer than the payload): must
    *       degrade to 'unknown', never throw;
    *   3 — opaque non-audio bytes: pass through as 'unknown'.
    *
    * Header parameters derive from doc_id by integer arithmetic so the
    * ORACLE restates the CONSTRUCTION while the engine runs the PARSE —
    * same closed loop as q98. */
  private[graft] object WavBytes {
    def sampleRate(id: Long): Long = 8000L + (id * 2711L) % 40001L
    def channels(id: Long): Long = 1L + (id / 4) % 2
    def bits(id: Long): Long = if (id % 4 == 0) 16L else 8L
    def nFrames(id: Long): Long = 16L + (id * 127L) % 257L
    def blockAlign(id: Long): Long = channels(id) * bits(id) / 8
    def dataSize(id: Long): Long = nFrames(id) * blockAlign(id)

    private def le32(v: Long): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    private def le16(v: Long): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

    private def fmtChunk(id: Long): Array[Byte] =
      fourcc("fmt ") ++ le32(16) ++ le16(1) ++ le16(channels(id)) ++
        le32(sampleRate(id)) ++ le32(sampleRate(id) * blockAlign(id)) ++
        le16(blockAlign(id)) ++ le16(bits(id))
    private def dataChunk(id: Long): Array[Byte] =
      fourcc("data") ++ le32(dataSize(id)) ++
        Array.fill(dataSize(id).toInt)(0.toByte)
    private def riff(body: Array[Byte]): Array[Byte] =
      fourcc("RIFF") ++ le32(body.length + 4L) ++ fourcc("WAVE") ++ body

    def payload(id: Long, text: String): Array[Byte] = (id % 4) match {
      case 0 => riff(fmtChunk(id) ++ dataChunk(id))
      case 1 =>
        // JUNK size 5 is odd: the spec's pad byte must be skipped
        riff(fourcc("JUNK") ++ le32(5) ++ "graft".getBytes("US-ASCII") ++
          Array[Byte](0) ++ fmtChunk(id) ++ dataChunk(id))
      case 2 => riff(fourcc("fmt ") ++ le32(16) ++ le16(1) ++ le16(1))
      // 0x00 lead byte: no RIFF container can start with NUL (the
      // fourcc is ASCII 'RIFF'), so the opaque class is structurally
      // un-parseable — the oracle's hardcoded 'unknown' for this class
      // can never collide with corpus text that happens to spell a
      // valid RIFF/WAVE header
      case _ => Array[Byte](0) ++ text.getBytes("UTF-8")
    }
  }

  /** Pure-JVM WAV-header decode: verify the RIFF/WAVE container, walk
    * little-endian chunks (size + odd-size pad byte) to the PCM fmt
    * fields and the data chunk size. Defensive on truncation and
    * malformed sizes — a corrupt blob degrades to 'unknown', never
    * throws. Returns (format, channels, sample_rate, bits, n_frames,
    * duration_ms); n_frames = data_size / block_align and duration from
    * byte rate, both computed from PARSED fields only. */
  private[graft] def decodeWavHeader(b: Array[Byte])
      : (String, Option[Long], Option[Long], Option[Long], Option[Long], Option[Long]) = {
    val unknown = ("unknown", None, None, None, None, None)
    def u8(i: Int): Int = b(i) & 0xFF
    def le16(i: Int): Long = (u8(i) | (u8(i + 1) << 8)).toLong
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)
    def cc(i: Int, s: String): Boolean =
      s.indices.forall(j => u8(i + j) == s.charAt(j).toInt)
    if (b.length < 12 || !cc(0, "RIFF") || !cc(8, "WAVE")) return unknown
    var i = 12
    var fmt: Option[(Long, Long, Long, Long)] = None // ch, rate, align, bits
    var data: Option[Long] = None
    while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val size = le32(i + 4) // unsigned 32-bit: 0..4294967295, as Long
      if (cc(i, "fmt ")) {
        if (size < 16 || i + 8 + 16 > b.length) return unknown
        fmt = Some((le16(i + 10), le32(i + 12), le16(i + 20), le16(i + 22)))
      } else if (cc(i, "data")) {
        if (i + 8 + size > b.length) return unknown
        data = Some(size)
      }
      // advance in Long space: a declared size near 2^32 must neither
      // truncate to a non-advancing/negative Int (infinite loop) nor
      // index past the array (AIOOBE) — a chunk that cannot fit simply
      // ends the walk, and the fmt/data state decides the outcome
      val next = i.toLong + 8L + size + (size & 1L) // sizes pad to even
      i = if (next > b.length) b.length else next.toInt
    }
    (fmt, data) match {
      case (Some((ch, rate, align, bits)), Some(ds))
          if ch > 0 && rate > 0 && align > 0 =>
        ("wav", Some(ch), Some(rate), Some(bits), Some(ds / align),
          Some(ds * 1000L / (rate * align)))
      case _ => unknown
    }
  }

  /** q105: typed audio-header extraction — the multimodal tier's audio
    * decoder, completing the image (q98) / audio pair. Same q71
    * mapPartitions batch seam; the decoder body parses the real RIFF
    * chunk structure (see [[WavBytes]] for the format-true payloads and
    * [[decodeWavHeader]] for the walk). Oracle-exact: the oracle
    * restates the construction arithmetic, so a parse defect (fixed
    * fmt offset, missed pad byte, unchecked truncation) breaks the
    * hash. Scale shape: row-local decode, no shuffle before the
    * presentation sort — identical to q98's measured 2.6x @16x. */
  def q105WavHeader(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { batch =>
        batch.map { case (id, text) =>
          val bytes = WavBytes.payload(id, text)
          val (fmt, ch, rate, bits, frames, ms) = decodeWavHeader(bytes)
          (id, bytes.length.toLong, fmt, ch, rate, bits, frames, ms)
        }
      }
      .toDF("doc_id", "n_bytes", "format", "channels", "sample_rate",
        "bits", "n_frames", "duration_ms")
      .orderBy(col("doc_id"))
  }

  // ---- q114: FULL-PAYLOAD pixel decode through the pluggable seam ----

  /** The pluggable payload-decoder seam the multimodal tier's stub
    * decoders occupy (the [[graft.streaming.SearchDocSink]] transport-
    * seam pattern applied to decoding): the Spark-side plumbing — the
    * mapPartitions batch shape, schema, partitioning — is fixed by the
    * operators; the BYTES → features body is an implementation of this
    * trait, swappable for a native codec library in an environment that
    * ships one. `None` = "this decoder cannot parse the payload" and
    * must degrade to an `unknown` row, never an exception (the corrupt-
    * blob-in-a-100TB-corpus rule q98/q105/q113 already follow). */
  trait PayloadDecoder[T] extends Serializable {
    /** Format tag stamped on successfully decoded rows. */
    def format: String
    def decode(bytes: Array[Byte]): Option[T]
  }

  /** q71's stub body, restated as the seam it occupies: deterministic
    * per-byte-stride sums standing in for a codec's feature vector.
    * Always decodes (any byte string has stride sums) — the honest
    * contract for a stub that types like a featurizer. */
  object StrideSumDecoder extends PayloadDecoder[Array[Long]] {
    val format = "stub"
    def decode(bytes: Array[Byte]): Option[Array[Long]] = Some(
      Array.tabulate(8) { i =>
        var acc = 0L; var j = i
        while (j < bytes.length) { acc += bytes(j) & 0xFF; j += 8 }
        acc
      })
  }

  /** Format-true synthetic BMP payloads per the public Windows BMP
    * layout (BITMAPFILEHEADER + BITMAPINFOHEADER, the format Microsoft
    * documents publicly and every codec ships): uncompressed BI_RGB
    * 24-bit pixels, rows padded to 4-byte strides, bottom-up unless
    * biHeight is negative. BMP is the one mainstream image format whose
    * PIXELS are parseable with no codec library — which is exactly why
    * it carries the tier's first full-payload (not header-only) decode.
    * Four classes by doc_id % 4 exercise the decode contract:
    *
    *   0 — bottom-up 24-bit BMP (biHeight = +h): the row-flip case;
    *   1 — TOP-DOWN 24-bit BMP (biHeight = -h, the spec's top-down
    *       encoding): file row order IS image row order — a decoder
    *       that always flips gets orientation-sensitive stats wrong;
    *   2 — truncated (header declares more pixel bytes than exist):
    *       degrade to 'unknown', never throw or read junk;
    *   3 — opaque text behind a NUL lead byte (structurally never a
    *       'BM' signature — the q105 rule).
    *
    * Pixel bytes are a deterministic function of (doc_id, file row,
    * column, channel); row-padding bytes are 0xFF so a decoder that
    * sums stride bytes instead of pixel bytes fails the gate. Dims stay
    * tiny (w ≤ 8, h ≤ 7) so the ORACLE can restate the construction
    * with a per-doc range expansion. */
  private[graft] object BmpBytes {
    def width(id: Long): Long = 2L + (id * 37L) % 7L
    def height(id: Long): Long = 2L + (id * 53L) % 6L
    def stride(id: Long): Long = (3L * width(id) + 3L) / 4L * 4L
    /** Pixel byte value at file row `fr`, column `x`, channel `c`
      * (0 = B, 1 = G, 2 = R — the BMP byte order). */
    def px(id: Long, fr: Long, x: Long, c: Long): Long =
      (id + 11L * fr + 5L * x + 7L * c) % 251L

    private def le32(v: Long): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    private def le16(v: Long): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

    /** 54-byte header: BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40).
      * `biHeight` carries the orientation sign. */
    private def header(id: Long, biHeight: Long, pixelBytes: Long): Array[Byte] =
      "BM".getBytes("US-ASCII") ++ le32(54L + pixelBytes) ++ le32(0) ++
        le32(54) ++
        le32(40) ++ le32(width(id)) ++ le32(biHeight & 0xFFFFFFFFL) ++
        le16(1) ++ le16(24) ++ le32(0) ++ le32(pixelBytes) ++
        le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0)

    private def pixelArray(id: Long): Array[Byte] = {
      val (w, h, st) = (width(id).toInt, height(id).toInt, stride(id).toInt)
      val out = Array.fill(st * h)(0xFF.toByte) // pad bytes are 0xFF
      var fr = 0
      while (fr < h) {
        var x = 0
        while (x < w) {
          var c = 0
          while (c < 3) {
            out(fr * st + 3 * x + c) = px(id, fr, x, c).toByte
            c += 1
          }
          x += 1
        }
        fr += 1
      }
      out
    }

    def payload(id: Long, text: String): Array[Byte] = (id % 4) match {
      case 0 =>
        val pix = pixelArray(id)
        header(id, height(id), pix.length) ++ pix
      case 1 =>
        val pix = pixelArray(id)
        header(id, -height(id), pix.length) ++ pix
      case 2 =>
        // header declares the full pixel array; only 4 bytes follow
        header(id, height(id), stride(id) * height(id)) ++
          Array.fill(4)(0x2A.toByte)
      case _ =>
        Array[Byte](0) ++ text.getBytes("UTF-8")
    }
  }

  /** Decoded whole-image statistics: dimensions, pixel count, per-
    * channel sums, and the orientation-sensitive luminance moment
    * Σ y·(b+g+r) over IMAGE coordinates (bottom-up files must flip
    * rows before weighting). */
  private[graft] case class BmpStats(w: Long, h: Long, nPx: Long,
      sumB: Long, sumG: Long, sumR: Long, ysumLum: Long)

  /** The REAL full-payload implementation of the seam: parse the BMP
    * headers at their spec offsets (little-endian), then walk the
    * actual pixel array — stride-padded rows, bottom-up row flip unless
    * biHeight < 0 — accumulating exact integer channel sums and the
    * y-weighted luminance moment. Accepts only the layout it can fully
    * decode (uncompressed BI_RGB 24-bit, one plane); anything else —
    * wrong magic, compressed, truncated pixel data — degrades to None.
    * Row-local integer arithmetic end to end: the decode distributes
    * with the rows and the stats are engine-portable. */
  private[graft] object BmpPixelDecoder extends PayloadDecoder[BmpStats] {
    val format = "bmp"
    def decode(b: Array[Byte]): Option[BmpStats] = {
      def u8(i: Int): Int = b(i) & 0xFF
      def le16(i: Int): Long = (u8(i) | (u8(i + 1) << 8)).toLong
      def le32(i: Int): Long =
        u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
          (u8(i + 3).toLong << 24)
      def s32(i: Int): Long = le32(i).toInt.toLong // sign-extend biHeight
      if (b.length < 54 || u8(0) != 'B'.toInt || u8(1) != 'M'.toInt) return None
      val dataOffset = le32(10)
      val biSize = le32(14)
      val w = s32(18)
      val hSigned = s32(22)
      val planes = le16(26)
      val bitCount = le16(28)
      val compression = le32(30)
      val h = math.abs(hSigned)
      if (biSize < 40 || planes != 1 || bitCount != 24 || compression != 0 ||
          w <= 0 || hSigned == 0 || dataOffset < 54) return None
      val stride = (3L * w + 3L) / 4L * 4L
      if (dataOffset + stride * h > b.length) return None // truncated
      var (sb, sg, sr, yl) = (0L, 0L, 0L, 0L)
      var fr = 0L
      while (fr < h) {
        val y = if (hSigned > 0) h - 1 - fr else fr // bottom-up flips
        var x = 0L
        var rowB = 0L; var rowG = 0L; var rowR = 0L
        while (x < w) {
          val base = (dataOffset + fr * stride + 3 * x).toInt
          rowB += u8(base); rowG += u8(base + 1); rowR += u8(base + 2)
          x += 1
        }
        sb += rowB; sg += rowG; sr += rowR
        yl += y * (rowB + rowG + rowR)
        fr += 1
      }
      Some(BmpStats(w, h, w * h, sb, sg, sr, yl))
    }
  }

  /** q114: whole-payload pixel statistics — the multimodal tier's first
    * FULL-payload decode (q98/q105/q113 stop at headers): format-true
    * uncompressed BMPs parsed pixel by pixel through the pluggable
    * [[PayloadDecoder]] seam, [[BmpPixelDecoder]] as the real
    * implementation. The oracle restates the payload CONSTRUCTION
    * (per-pixel value arithmetic expanded over each doc's w×h range) —
    * the engine runs the PARSE, so a wrong stride, an unapplied
    * bottom-up flip, padding bytes summed as pixels, or an unchecked
    * truncation all hash-fail. Scale shape: row-local mapPartitions
    * decode, no shuffle before the presentation sort (the q98 shape);
    * a real-codec deployment swaps the decoder instance, not the
    * operator. */
  def q114BmpPixels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { batch =>
        batch.map { case (id, text) =>
          val bytes = BmpBytes.payload(id, text)
          BmpPixelDecoder.decode(bytes) match {
            case Some(st) =>
              (id, bytes.length.toLong, BmpPixelDecoder.format, Option(st.w),
                Option(st.h), Option(st.nPx), Option(st.sumB), Option(st.sumG),
                Option(st.sumR), Option(st.ysumLum))
            case None =>
              (id, bytes.length.toLong, "unknown", None: Option[Long],
                None: Option[Long], None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long], None: Option[Long])
          }
        }
      }
      .toDF("doc_id", "n_bytes", "format", "img_w", "img_h", "n_px",
        "sum_b", "sum_g", "sum_r", "ysum_lum")
      .orderBy(col("doc_id"))
  }

  /** Format-true PNG payload construction — the COMPRESSED-codec class
    * q114's BMP tier stops short of: 8-bit truecolor images whose
    * scanlines are filter-encoded (type y % 5 — every filter in the
    * PNG spec appears) and zlib-deflated into IDAT. Pixel values are
    * construction arithmetic, so the oracle restates the RAW image and
    * the engine must run the real inflate + unfilter walk to match. */
  private[graft] object PngBytes {
    def width(id: Long): Long = 2L + (id * 41L) % 7L
    def height(id: Long): Long = 2L + (id * 59L) % 6L
    /** Raw pixel value at row `y`, column `x`, channel `c` (0 = R,
      * 1 = G, 2 = B — the PNG truecolor byte order). */
    def px(id: Long, y: Long, x: Long, c: Long): Long =
      (id + 13L * y + 3L * x + 5L * c) % 251L

    private def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

    /** One chunk: length + type + data + CRC32(type ++ data). */
    private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      be32(data.length.toLong) ++ t ++ data ++ be32(crc.getValue)
    }

    private def ihdr(id: Long): Array[Byte] =
      chunk("IHDR", be32(width(id)) ++ be32(height(id)) ++
        Array[Byte](8, 2, 0, 0, 0)) // depth 8, truecolor, no interlace

    /** Scanline stream BEFORE compression: per row a filter byte
      * (type y % 5) followed by the row's bytes filtered per the PNG
      * spec — Sub/Up/Average/Paeth against the RAW (unfiltered)
      * neighbors, bpp = 3. */
    private[graft] def filteredStream(id: Long): Array[Byte] = {
      val (w, h) = (width(id).toInt, height(id).toInt)
      val bpr = 3 * w
      val raw = Array.ofDim[Int](h, bpr)
      var y = 0
      while (y < h) {
        var i = 0
        while (i < bpr) {
          raw(y)(i) = px(id, y, i / 3, i % 3).toInt
          i += 1
        }
        y += 1
      }
      val out = new Array[Byte](h * (1 + bpr))
      y = 0
      while (y < h) {
        val ft = y % 5
        out(y * (1 + bpr)) = ft.toByte
        var i = 0
        while (i < bpr) {
          val cur = raw(y)(i)
          val left = if (i >= 3) raw(y)(i - 3) else 0
          val up = if (y > 0) raw(y - 1)(i) else 0
          val ul = if (y > 0 && i >= 3) raw(y - 1)(i - 3) else 0
          val f = ft match {
            case 0 => cur
            case 1 => cur - left
            case 2 => cur - up
            case 3 => cur - (left + up) / 2
            case _ =>
              val p = left + up - ul
              val (pa, pb, pc) =
                (math.abs(p - left), math.abs(p - up), math.abs(p - ul))
              val pred = if (pa <= pb && pa <= pc) left
                else if (pb <= pc) up else ul
              cur - pred
          }
          out(y * (1 + bpr) + 1 + i) = (f & 0xFF).toByte
          i += 1
        }
        y += 1
      }
      out
    }

    private def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](256)
      val bos = new java.io.ByteArrayOutputStream()
      while (!d.finished()) {
        val n = d.deflate(buf)
        bos.write(buf, 0, n)
      }
      d.end()
      bos.toByteArray
    }

    private val Sig = Array[Byte](
      0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

    def payload(id: Long, text: String): Array[Byte] = (id % 4) match {
      case 0 => // canonical: one IDAT
        Sig ++ ihdr(id) ++ chunk("IDAT", deflate(filteredStream(id))) ++
          chunk("IEND", Array.emptyByteArray)
      case 1 => // zlib stream SPLIT across two IDAT chunks — the decoder
        // must concatenate IDAT data before inflating
        val z = deflate(filteredStream(id))
        val (a, b) = z.splitAt(z.length / 2)
        Sig ++ ihdr(id) ++ chunk("IDAT", a) ++ chunk("IDAT", b) ++
          chunk("IEND", Array.emptyByteArray)
      case 2 => // IDAT bytes that are NOT a zlib stream: inflate must
        // fail closed, never crash or emit partial stats
        Sig ++ ihdr(id) ++
          chunk("IDAT", Array[Byte](0x2A, 0x2A, 0x2A, 0x2A)) ++
          chunk("IEND", Array.emptyByteArray)
      case _ => // opaque non-image payload
        Array[Byte](0) ++ text.getBytes("UTF-8")
    }
  }

  /** Decoded whole-image statistics for a truecolor PNG: dimensions,
    * pixel count, the DECOMPRESSED scanline-stream length, per-channel
    * sums and the row-weighted luminance moment Σ y·(r+g+b) over the
    * reconstructed raw pixels. */
  private[graft] case class PngStats(w: Long, h: Long, nPx: Long,
      rawLen: Long, sumR: Long, sumG: Long, sumB: Long, ysumLum: Long)

  /** The REAL compressed-codec implementation of the seam: chunk walk
    * with per-chunk CRC32 verification, IHDR validation (8-bit
    * truecolor, no interlace — anything else degrades to None), IDAT
    * concatenation, zlib inflate via java.util.zip.Inflater, then the
    * per-row unfilter walk (None/Sub/Up/Average/Paeth against the
    * reconstructed neighbors) accumulating exact integer channel sums.
    * Truncated or over-long zlib streams, short chunks, CRC mismatches
    * and bad filter types all fail closed — a corrupt blob in a 100 TB
    * corpus must degrade to 'unknown', not kill the stage. Row-local,
    * distributes with the rows. */
  private[graft] object PngPixelDecoder extends PayloadDecoder[PngStats] {
    val format = "png"
    def decode(b: Array[Byte]): Option[PngStats] = {
      if (b.length < 8) return None
      val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0D, 0x0A, 0x1A, 0x0A)
      var i = 0
      while (i < 8) { if ((b(i) & 0xFF) != sig(i)) return None; i += 1 }
      def be32(o: Int): Long =
        ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
          ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
      var pos = 8
      var w = -1L; var h = -1L
      var sawEnd = false
      val idat = new java.io.ByteArrayOutputStream()
      while (!sawEnd) {
        if (pos + 12 > b.length) return None
        val len = be32(pos)
        if (len < 0 || pos + 12 + len > b.length) return None
        val n = len.toInt
        val typ = new String(b, pos + 4, 4, "US-ASCII")
        val crc = new java.util.zip.CRC32()
        crc.update(b, pos + 4, 4 + n)
        if (crc.getValue != be32(pos + 8 + n)) return None
        typ match {
          case "IHDR" =>
            if (n != 13) return None
            w = be32(pos + 8); h = be32(pos + 12)
            val depth = b(pos + 16) & 0xFF
            val color = b(pos + 17) & 0xFF
            val comp = b(pos + 18) & 0xFF
            val filt = b(pos + 19) & 0xFF
            val inter = b(pos + 20) & 0xFF
            if (depth != 8 || color != 2 || comp != 0 || filt != 0 ||
              inter != 0) return None
          case "IDAT" => idat.write(b, pos + 8, n)
          case "IEND" => sawEnd = true
          case _ => () // ancillary chunk: skip
        }
        pos += 12 + n
      }
      if (w <= 0 || h <= 0 || w > (1L << 20) || h > (1L << 20)) return None
      // overflow guard: the per-dimension caps still allow h*(1+3w) past
      // Int range (up to ~3e12), where a .toInt wraps negative and kills
      // the task instead of degrading — bound the DECODED size in Long
      // first (a declared-huge header on a corrupt blob must read as
      // 'unknown', not as a NegativeArraySizeException)
      val expectL = h * (1L + 3L * w)
      if (expectL > (1L << 28)) return None // 256 MiB decoded-image cap
      val bpr = 3 * w.toInt
      val expect = expectL.toInt
      val raw = new Array[Byte](expect)
      val inf = new java.util.zip.Inflater()
      try {
        inf.setInput(idat.toByteArray)
        var off = 0
        while (off < expect) {
          val n = try inf.inflate(raw, off, expect - off)
          catch { case _: java.util.zip.DataFormatException => return None }
          if (n == 0) return None // truncated or stalled stream
          off += n
        }
        // the stream must END exactly here — extra pixels are malformed
        val extra = try inf.inflate(new Array[Byte](1))
        catch { case _: java.util.zip.DataFormatException => return None }
        if (extra > 0 || !inf.finished()) return None
      } finally inf.end()

      val prev = new Array[Int](bpr) // zeros above row 0, per spec
      val cur = new Array[Int](bpr)
      var sr = 0L; var sg = 0L; var sb = 0L; var yl = 0L
      var y = 0
      while (y < h) {
        val base = y * (1 + bpr)
        val ft = raw(base) & 0xFF
        if (ft > 4) return None
        var j = 0
        while (j < bpr) {
          val f = raw(base + 1 + j) & 0xFF
          val left = if (j >= 3) cur(j - 3) else 0
          val up = prev(j)
          val ul = if (j >= 3) prev(j - 3) else 0
          val v = ft match {
            case 0 => f
            case 1 => f + left
            case 2 => f + up
            case 3 => f + (left + up) / 2
            case _ =>
              val p = left + up - ul
              val (pa, pb, pc) =
                (math.abs(p - left), math.abs(p - up), math.abs(p - ul))
              val pred = if (pa <= pb && pa <= pc) left
                else if (pb <= pc) up else ul
              f + pred
          }
          cur(j) = v & 0xFF
          j += 1
        }
        var x = 0
        var rr = 0L; var rg = 0L; var rb = 0L
        while (x < w) {
          rr += cur(3 * x); rg += cur(3 * x + 1); rb += cur(3 * x + 2)
          x += 1
        }
        sr += rr; sg += rg; sb += rb
        yl += y.toLong * (rr + rg + rb)
        System.arraycopy(cur, 0, prev, 0, bpr)
        y += 1
      }
      Some(PngStats(w, h, w * h, expect.toLong, sr, sg, sb, yl))
    }
  }

  /** q115: COMPRESSED full-payload decode — the step past q114's
    * uncompressed BMP walk: format-true PNGs (zlib IDAT, every PNG
    * filter type in the scanline stream) decoded end to end through
    * the [[PayloadDecoder]] seam with [[PngPixelDecoder]] — real
    * chunk/CRC validation, real java.util.zip inflate, real unfilter
    * reconstruction. The oracle restates the RAW pixel construction,
    * so a broken inflate loop, a wrong Paeth predictor, a missed
    * filter-byte offset, or an unverified CRC all hash-fail. Scale
    * shape: row-local mapPartitions, no shuffle before the
    * presentation sort. */
  def q115PngPixels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { batch =>
        batch.map { case (id, text) =>
          val bytes = PngBytes.payload(id, text)
          PngPixelDecoder.decode(bytes) match {
            case Some(st) =>
              (id, PngPixelDecoder.format, Option(st.w), Option(st.h),
                Option(st.nPx), Option(st.rawLen), Option(st.sumR),
                Option(st.sumG), Option(st.sumB), Option(st.ysumLum))
            case None =>
              (id, "unknown", None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long], None: Option[Long])
          }
        }
      }
      .toDF("doc_id", "format", "img_w", "img_h", "n_px", "raw_len",
        "sum_r", "sum_g", "sum_b", "ysum_lum")
      .orderBy(col("doc_id"))
  }

  /** q98: typed image-header extraction — the multimodal tier's decode
    * seam made REAL: the q71 mapPartitions batch shape, but the decoder
    * body actually parses PNG/JPEG header structures from the public
    * format specs instead of stubbing. Payloads are format-true
    * synthetic bytes (see [[ImageBytes]]); opaque payloads flow through
    * as 'unknown' rows (the honest seam for formats the engine does not
    * decode). Oracle-exact: the oracle restates the construction
    * arithmetic, so any parse defect breaks the hash. */
  def q98ImageHeader(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { batch =>
        batch.map { case (id, text) =>
          val bytes = ImageBytes.payload(id, text)
          val (fmt, w, h, c) = decodeImageHeader(bytes)
          (id, bytes.length.toLong, fmt, w, h, c)
        }
      }
      .toDF("doc_id", "n_bytes", "format", "img_w", "img_h", "channels")
      .orderBy(col("doc_id"))
  }

  /** Format-true ISO-BMFF (MP4) payloads — the VIDEO-container member
    * of the metadata-parse family (q98 image, q105 audio, q113 GIF):
    * a real box tree — ftyp brand, moov with a versioned mvhd and
    * per-track tkhd children, and an mdat whose bytes are construction
    * arithmetic. Class 1 exercises the 64-bit largesize path and the
    * version-1 (64-bit time) mvhd/tkhd layouts — both published spec
    * variants a naive parser gets wrong. */
  private[graft] object Mp4Bytes {
    def timescale(id: Long): Long = 600L + (id * 13L) % 1000L
    def durationTicks(id: Long): Long = 1000L + (id * 97L) % 100000L
    def nTraks(id: Long): Long = 1L + id % 3L
    def trakId(id: Long, k: Long): Long = 1L + k
    def mdatLen(id: Long): Long = 10L + id % 50L
    def mdatByte(id: Long, j: Long): Long = (id + j) % 251L
    def mdatSum(id: Long): Long =
      (0L until mdatLen(id)).map(mdatByte(id, _)).sum

    private def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    private def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v & 0xFFFFFFFFL)
    private def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ typ.getBytes("US-ASCII") ++ payload
    /** The 64-bit form: size field 1, then the real largesize. */
    private def largeBox(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(1L) ++ typ.getBytes("US-ASCII") ++ be64(payload.length + 16L) ++ payload

    private def ftyp: Array[Byte] =
      box("ftyp", "isom".getBytes("US-ASCII") ++ be32(512L) ++
        "isom".getBytes("US-ASCII") ++ "mp41".getBytes("US-ASCII"))

    private def mvhd(id: Long, v1: Boolean): Array[Byte] = {
      val times =
        if (v1) be64(0L) ++ be64(0L) ++ be32(timescale(id)) ++ be64(durationTicks(id))
        else be32(0L) ++ be32(0L) ++ be32(timescale(id)) ++ be32(durationTicks(id))
      box("mvhd", Array[Byte](if (v1) 1 else 0, 0, 0, 0) ++ times ++
        be32(0x00010000L) ++ Array[Byte](0x01, 0, 0, 0) ++ // rate, volume+reserved
        new Array[Byte](8) ++ new Array[Byte](36) ++ // reserved, matrix
        new Array[Byte](24) ++ be32(nTraks(id) + 1)) // predefined, next_track
    }
    private def tkhd(id: Long, k: Long, v1: Boolean): Array[Byte] = {
      val head =
        if (v1) be64(0L) ++ be64(0L) ++ be32(trakId(id, k)) ++ be32(0L) ++ be64(0L)
        else be32(0L) ++ be32(0L) ++ be32(trakId(id, k)) ++ be32(0L) ++ be32(0L)
      box("tkhd", Array[Byte](if (v1) 1 else 0, 0, 0, 7) ++ head ++
        new Array[Byte](52)) // reserved/layer/matrix/dims
    }
    private def trak(id: Long, k: Long, v1: Boolean): Array[Byte] =
      box("trak", tkhd(id, k, v1))
    private def moov(id: Long, v1: Boolean): Array[Byte] =
      box("moov", mvhd(id, v1) ++
        (0L until nTraks(id)).flatMap(trak(id, _, v1)).toArray)
    private def mdat(id: Long, large: Boolean): Array[Byte] = {
      val body = Array.tabulate(mdatLen(id).toInt)(j =>
        (mdatByte(id, j.toLong) & 0xFF).toByte)
      if (large) largeBox("mdat", body) else box("mdat", body)
    }

    def payload(id: Long, text: String): Array[Byte] = (id % 4) match {
      case 0 => ftyp ++ moov(id, v1 = false) ++ mdat(id, large = false)
      case 1 => // 64-bit sizes + version-1 time layouts
        ftyp ++ moov(id, v1 = true) ++ mdat(id, large = true)
      case 2 => // MALFORMED: moov declares 4 bytes more than present
        val m = moov(id, v1 = false)
        val oversized = be32(m.length + 4L) ++ m.drop(4)
        ftyp ++ oversized
      case _ => Array[Byte](0) ++ text.getBytes("UTF-8") // opaque
    }
  }

  /** Parsed MP4 container metadata: brand, movie timescale/duration
    * (+ derived floor-divided ms), track count, sum of track ids (the
    * child-walk gate) and the mdat byte count + byte sum (the payload
    * gate). */
  private[graft] case class Mp4Stats(brand: String, timescale: Long,
      durationTicks: Long, durationMs: Long, nTraks: Long, trakIdSum: Long,
      mdatBytes: Long, mdatSum: Long)

  /** Pure-JVM ISO-BMFF box walk: top-level boxes (with the size==1
    * 64-bit largesize form), the moov→mvhd versioned time layout
    * (version 1 carries 64-bit creation/modification/duration), the
    * moov→trak→tkhd child walk (track ids at their version-dependent
    * offsets), and the mdat byte sum. ftyp must lead (the spec's
    * placement rule); exactly one moov/mvhd; any box overrunning the
    * buffer, a size under the header length, or a missing structure
    * degrades to None — corrupt blobs must not kill a 100 TB stage. */
  private[graft] object Mp4Decoder extends PayloadDecoder[Mp4Stats] {
    val format = "mp4"
    def decode(b: Array[Byte]): Option[Mp4Stats] = {
      def be32(o: Int): Long =
        ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
          ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
      def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)
      def cc(o: Int): String = new String(b, o + 4, 4, "US-ASCII")
      if (b.length < 8) return None
      var brand: String = null
      var ts = -1L; var dur = -1L
      var traks = 0L; var idSum = 0L
      var mdatBytes = 0L; var mdatSum = 0L
      var sawMoov = false
      var i = 0
      var first = true
      while (i + 8 <= b.length) {
        val size0 = be32(i)
        val typ = cc(i)
        // payload offset + total size under both size forms
        val (off, size) =
          if (size0 == 1L) {
            if (i + 16 > b.length) return None
            (i + 16, be64(i + 8))
          } else (i + 8, size0)
        // overflow-safe bounds: compare against the REMAINING buffer,
        // never compute i + size (a 64-bit largesize near Long.MaxValue
        // wraps i + size negative, slipping past a naive check and
        // turning the walk into an infinite loop — the q105 2^32
        // lesson at 64 bits). size >= off - i also guarantees forward
        // progress below.
        if (size < (off - i).toLong || size > (b.length - i).toLong) return None
        if (first && typ != "ftyp") return None // spec placement rule
        typ match {
          case "ftyp" =>
            if (size < (off - i) + 8) return None
            brand = new String(b, off, 4, "US-ASCII")
          case "moov" =>
            if (sawMoov) return None
            sawMoov = true
            // child walk within [off, i + size)
            var j = off
            val end = (i + size).toInt
            var sawMvhd = false
            while (j + 8 <= end) {
              val csize = be32(j)
              val ctyp = cc(j)
              if (csize < 8 || j + csize > end) return None
              ctyp match {
                case "mvhd" =>
                  if (sawMvhd) return None
                  sawMvhd = true
                  // version byte lives PAST the 8-byte header: a
                  // header-only child ending at the buffer edge must
                  // degrade, not throw on the read
                  if (csize < 12) return None
                  val v = b(j + 8) & 0xFF
                  // version-dependent minimum size: reads must stay
                  // inside THIS box, not spill into the next child
                  if (v == 0) {
                    if (csize < 28) return None
                    ts = be32(j + 20); dur = be32(j + 24)
                  } else if (v == 1) {
                    if (csize < 40) return None
                    ts = be32(j + 28); dur = be64(j + 32)
                  } else return None
                case "trak" =>
                  traks += 1
                  // first child must be tkhd for our gate; walk to it
                  var k = j + 8
                  val tend = (j + csize).toInt
                  var found = false
                  while (!found && k + 8 <= tend) {
                    val ksize = be32(k)
                    if (ksize < 8 || k + ksize > tend) return None
                    if (cc(k) == "tkhd") {
                      if (ksize < 12) return None // header-only child
                      val tv = b(k + 8) & 0xFF
                      if (tv == 0) {
                        if (ksize < 24) return None
                        idSum += be32(k + 20)
                      } else if (tv == 1) {
                        if (ksize < 32) return None
                        idSum += be32(k + 28)
                      } else return None
                      found = true
                    }
                    k += ksize.toInt
                  }
                  if (!found) return None
                case _ => ()
              }
              j += csize.toInt
            }
            if (!sawMvhd) return None
          case "mdat" =>
            var j = off
            val end = (i + size).toInt
            mdatBytes += end - off
            while (j < end) { mdatSum += (b(j) & 0xFF).toLong; j += 1 }
          case _ => ()
        }
        first = false
        i += size.toInt
      }
      if (brand == null || !sawMoov || ts <= 0 || dur < 0) return None
      Some(Mp4Stats(brand, ts, dur, dur * 1000L / ts, traks, idSum,
        mdatBytes, mdatSum))
    }
  }

  /** q118: VIDEO-container metadata — a real ISO-BMFF (MP4) box-tree
    * walk, completing the modality row (image q98/q114-q116, audio
    * q105/q117, GIF q113, video here): ftyp brand, the versioned mvhd
    * time layout (v0 32-bit and v1 64-bit), the trak→tkhd child walk
    * (track-id sum gates it), the 64-bit largesize form, and the mdat
    * byte sum (payload gate). Oracle-exact against construction; a
    * wrong version offset, an unhandled largesize, or an accepted
    * overrunning box all hash-fail. Row-local mapPartitions. */
  def q118Mp4Boxes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { batch =>
        batch.map { case (id, text) =>
          val bytes = Mp4Bytes.payload(id, text)
          Mp4Decoder.decode(bytes) match {
            case Some(st) =>
              (id, Mp4Decoder.format, Option(st.brand), Option(st.timescale),
                Option(st.durationTicks), Option(st.durationMs),
                Option(st.nTraks), Option(st.trakIdSum), Option(st.mdatBytes),
                Option(st.mdatSum))
            case None =>
              (id, "unknown", None: Option[String], None: Option[Long],
                None: Option[Long], None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long], None: Option[Long])
          }
        }
      }
      .toDF("doc_id", "format", "brand", "timescale", "duration_ticks",
        "duration_ms", "n_traks", "trak_id_sum", "mdat_bytes", "mdat_sum")
      .orderBy(col("doc_id"))
  }

  /** Format-true PCM WAV payloads — the audio member of the
    * FULL-PAYLOAD decode family (q105 stops at the header; this class
    * carries real signed 16-bit little-endian samples whose values are
    * construction arithmetic, so the oracle restates the waveform and
    * the engine must run the real sample decode to match). */
  private[graft] object WavPcmBytes {
    val Rate = 8000L
    def channels(id: Long): Long = 1L + id % 4 % 2 // class 0 mono, 1 stereo
    def nFrames(id: Long): Long = 50L + (id * 31L) % 200L
    /** Signed 16-bit sample at frame `i`, channel `ch` —
      * range [-32760, 32760], inside int16 by construction. */
    def sample(id: Long, i: Long, ch: Long): Long =
      ((id + 37L * i + 101L * ch) % 65521L) - 32760L

    private def le32(v: Long): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    private def le16(v: Long): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

    private def fmtChunk(ch: Long): Array[Byte] =
      fourcc("fmt ") ++ le32(16) ++ le16(1) ++ le16(ch) ++
        le32(Rate) ++ le32(Rate * ch * 2) ++ le16(ch * 2) ++ le16(16)
    private def samples(id: Long): Array[Byte] = {
      val (ch, n) = (channels(id).toInt, nFrames(id).toInt)
      val out = new Array[Byte](n * ch * 2)
      var i = 0
      while (i < n) {
        var c = 0
        while (c < ch) {
          val v = sample(id, i, c)
          out(2 * (i * ch + c)) = (v & 0xFF).toByte
          out(2 * (i * ch + c) + 1) = ((v >> 8) & 0xFF).toByte
          c += 1
        }
        i += 1
      }
      out
    }
    private def riff(body: Array[Byte]): Array[Byte] =
      fourcc("RIFF") ++ le32(body.length + 4L) ++ fourcc("WAVE") ++ body

    def payload(id: Long, text: String): Array[Byte] = (id % 4) match {
      case 0 => // mono, with an ODD-sized ancillary chunk (pad rule)
        val s = samples(id)
        riff(fourcc("LIST") ++ le32(5) ++ "graft".getBytes("US-ASCII") ++
          Array[Byte](0) ++ fmtChunk(1) ++
          fourcc("data") ++ le32(s.length.toLong) ++ s)
      case 1 => // stereo
        val s = samples(id)
        riff(fmtChunk(2) ++ fourcc("data") ++ le32(s.length.toLong) ++ s)
      case 2 => // MALFORMED: data chunk DECLARES 4 more bytes than the
        // payload carries — sample decode must fail closed, never read
        // past the buffer or emit stats for a truncated waveform
        val s = samples(id)
        riff(fmtChunk(1) ++ fourcc("data") ++ le32(s.length + 4L) ++ s)
      case _ => Array[Byte](0) ++ text.getBytes("UTF-8") // opaque
    }
  }

  /** Decoded whole-waveform statistics: per-channel exact integer sum /
    * min / max over the signed samples, plus the frame-weighted moment
    * Σ i·s(i, ch0) — order-sensitive, so byte-swapped endianness, an
    * off-by-one frame walk, or interleave errors all change it even
    * when the sums survive. */
  private[graft] case class WavPcmStats(channels: Long, rate: Long,
      nFrames: Long, sumL: Long, minL: Long, maxL: Long, imomentL: Long,
      sumR: Long, minR: Long, maxR: Long)

  /** REAL full-payload PCM decode: the q105 chunk walk (odd-size pad
    * rule included) continued INTO the data chunk — validates
    * PCM tag / 16-bit / 1-2 channels / block-align and byte-rate
    * consistency / data completeness and alignment, then decodes every
    * interleaved signed little-endian sample. Truncated declarations
    * (data size past the buffer), misaligned data sizes and non-PCM
    * formats all degrade to None. Row-local, distributes with rows. */
  private[graft] object WavPcmDecoder extends PayloadDecoder[WavPcmStats] {
    val format = "wav"
    def decode(b: Array[Byte]): Option[WavPcmStats] = {
      def u8(i: Int): Int = b(i) & 0xFF
      def le16(i: Int): Long = (u8(i) | (u8(i + 1) << 8)).toLong
      def le32(i: Int): Long =
        u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
          (u8(i + 3).toLong << 24)
      def cc(i: Int, s: String): Boolean =
        s.indices.forall(j => u8(i + j) == s.charAt(j).toInt)
      if (b.length < 12 || !cc(0, "RIFF") || !cc(8, "WAVE")) return None
      var i = 12
      var fmt: Option[(Long, Long, Long, Long, Long)] = None // ch, rate, byteRate, align, bits
      var data: Option[(Int, Long)] = None // offset, size
      while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
        val size = le32(i + 4)
        if (size < 0 || i + 8 + size > b.length) {
          return None // any overrun declaration (data included): corrupt
        }
        if (cc(i, "fmt ")) {
          if (size < 16) return None
          fmt = Some((le16(i + 10), le32(i + 12), le32(i + 16),
            le16(i + 20), le16(i + 22)))
          if (le16(i + 8) != 1L) return None // not PCM
        } else if (cc(i, "data")) data = Some((i + 8, size))
        i += 8 + size.toInt + (size.toInt & 1) // odd-size pad byte
      }
      val (ch, rate, byteRate, align, bits) = fmt.getOrElse(return None)
      val (off, size) = data.getOrElse(return None)
      if (bits != 16 || ch < 1 || ch > 2 || align != ch * 2 ||
        rate <= 0 || byteRate != rate * align || size % align != 0)
        return None
      val n = (size / align).toInt
      var (sl, nl, xl, im) = (0L, Long.MaxValue, Long.MinValue, 0L)
      var (sr, nr, xr) = (0L, Long.MaxValue, Long.MinValue)
      var f = 0
      while (f < n) {
        val base = off + f * align.toInt
        val l = (le16(base).toShort).toLong // sign-extend int16
        sl += l; if (l < nl) nl = l; if (l > xl) xl = l
        im += f.toLong * l
        if (ch == 2) {
          val r = (le16(base + 2).toShort).toLong
          sr += r; if (r < nr) nr = r; if (r > xr) xr = r
        }
        f += 1
      }
      if (n == 0) { nl = 0; xl = 0 }
      if (ch == 1 || n == 0) { sr = 0; nr = 0; xr = 0 }
      Some(WavPcmStats(ch, rate, n.toLong, sl, nl, xl, im, sr, nr, xr))
    }
  }

  /** q117: FULL-PAYLOAD audio decode — the waveform itself, not just
    * q105's header fields: every interleaved signed 16-bit PCM sample
    * decoded and reduced to exact integer per-channel statistics. The
    * oracle restates the sample-value construction, so a wrong
    * sign-extension, byte order, interleave stride, or an accepted
    * truncated data declaration all hash-fail; the frame-weighted
    * moment makes sample ORDER part of the gate. Completes the
    * full-payload decode family across image (q114/q115/q116) and
    * audio. Scale shape: row-local mapPartitions (the q98 shape). */
  def q117WavPcm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { batch =>
        batch.map { case (id, text) =>
          val bytes = WavPcmBytes.payload(id, text)
          WavPcmDecoder.decode(bytes) match {
            case Some(st) =>
              (id, WavPcmDecoder.format, Option(st.channels), Option(st.rate),
                Option(st.nFrames), Option(st.sumL), Option(st.minL),
                Option(st.maxL), Option(st.imomentL),
                if (st.channels == 2) Option(st.sumR) else None,
                if (st.channels == 2) Option(st.minR) else None,
                if (st.channels == 2) Option(st.maxR) else None)
            case None =>
              (id, "unknown", None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long])
          }
        }
      }
      .toDF("doc_id", "format", "n_channels", "sample_rate", "n_frames",
        "sum_l", "min_l", "max_l", "imoment_l", "sum_r", "min_r", "max_r")
      .orderBy(col("doc_id"))
  }

  /** Format-true PNG VARIANT payloads — the two core decode paths
    * q115's canonical tier (8-bit truecolor, no interlace) leaves out:
    * indexed color (type 3 + PLTE) and Adam7 interlacing (the 7-pass
    * progressive layout, each pass filter-encoded as an independent
    * sub-image). Pixel/palette values are construction arithmetic so
    * the oracle restates the FINAL RGB image; the engine must run the
    * real palette lookup / pass-deposit geometry to match. */
  private[graft] object PngVariantBytes {
    def width(id: Long): Long = 2L + (id * 37L) % 8L
    def height(id: Long): Long = 2L + (id * 53L) % 7L
    /** Palette size for the indexed classes. */
    def palSize(id: Long): Long = 2L + id % 13L
    /** Palette entry `j`, channel `c` (0=R,1=G,2=B). */
    def pal(id: Long, j: Long, c: Long): Long = (id + 11L * j + 5L * c) % 251L
    /** Palette index at (y, x). */
    def idx(id: Long, y: Long, x: Long): Long =
      (id + 7L * y + 3L * x) % palSize(id)
    /** Truecolor value at (y, x, c) for the interlaced class. */
    def px(id: Long, y: Long, x: Long, c: Long): Long =
      (id + 17L * y + 3L * x + 7L * c) % 251L

    private def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

    private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      be32(data.length.toLong) ++ t ++ data ++ be32(crc.getValue)
    }

    private def ihdr(w: Long, h: Long, colorType: Int,
        interlace: Int): Array[Byte] =
      chunk("IHDR", be32(w) ++ be32(h) ++
        Array[Byte](8, colorType.toByte, 0, 0, interlace.toByte))

    private def plte(id: Long): Array[Byte] = {
      val p = palSize(id).toInt
      val d = new Array[Byte](3 * p)
      var j = 0
      while (j < p) {
        var c = 0
        while (c < 3) { d(3 * j + c) = (pal(id, j, c) & 0xFF).toByte; c += 1 }
        j += 1
      }
      chunk("PLTE", d)
    }

    /** PNG filter encode of one raw sub-image (any bpp), filter type
      * per row = (row + seed) % 5 — every filter appears, offset per
      * pass so passes exercise different filter mixes. */
    private def filterImage(raw: Array[Array[Int]], bpp: Int,
        seed: Int): Array[Byte] = {
      val h = raw.length
      if (h == 0) return Array.emptyByteArray
      val bpr = raw(0).length
      val out = new Array[Byte](h * (1 + bpr))
      var y = 0
      while (y < h) {
        val ft = (y + seed) % 5
        out(y * (1 + bpr)) = ft.toByte
        var i = 0
        while (i < bpr) {
          val cur = raw(y)(i)
          val left = if (i >= bpp) raw(y)(i - bpp) else 0
          val up = if (y > 0) raw(y - 1)(i) else 0
          val ul = if (y > 0 && i >= bpp) raw(y - 1)(i - bpp) else 0
          val f = ft match {
            case 0 => cur
            case 1 => cur - left
            case 2 => cur - up
            case 3 => cur - (left + up) / 2
            case _ =>
              val p = left + up - ul
              val (pa, pb, pc) =
                (math.abs(p - left), math.abs(p - up), math.abs(p - ul))
              val pred = if (pa <= pb && pa <= pc) left
                else if (pb <= pc) up else ul
              cur - pred
          }
          out(y * (1 + bpr) + 1 + i) = (f & 0xFF).toByte
          i += 1
        }
        y += 1
      }
      out
    }

    private def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](256)
      val bos = new java.io.ByteArrayOutputStream()
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end()
      bos.toByteArray
    }

    /** Adam7 pass geometry (PNG spec §8.2). */
    private[graft] val XOrig = Array(0, 4, 0, 2, 0, 1, 0)
    private[graft] val YOrig = Array(0, 0, 4, 0, 2, 0, 1)
    private[graft] val XStep = Array(8, 8, 4, 4, 2, 2, 1)
    private[graft] val YStep = Array(8, 8, 8, 4, 4, 2, 2)

    /** Palette scanline stream (interlace 0, bpp = 1), index clamp
      * OVERRIDDEN for the malformed class: `poison` >= 0 plants that
      * index at (0, 0). */
    private def paletteStream(id: Long, poison: Long): Array[Byte] = {
      val (w, h) = (width(id).toInt, height(id).toInt)
      val raw = Array.tabulate(h, w)((y, x) =>
        if (poison >= 0 && y == 0 && x == 0) poison.toInt
        else idx(id, y, x).toInt)
      filterImage(raw, bpp = 1, seed = 0)
    }

    /** Adam7 truecolor stream: each pass an independently filtered
      * sub-image of the FINAL-coordinate pixel values; empty passes
      * contribute nothing (the spec rule). */
    private[graft] def adam7Stream(id: Long): Array[Byte] = {
      val (w, h) = (width(id).toInt, height(id).toInt)
      val bos = new java.io.ByteArrayOutputStream()
      var pass = 0
      while (pass < 7) {
        val pw = (w - XOrig(pass) + XStep(pass) - 1) / XStep(pass)
        val ph = (h - YOrig(pass) + YStep(pass) - 1) / YStep(pass)
        if (pw > 0 && ph > 0) {
          val raw = Array.tabulate(ph, 3 * pw) { (py, i) =>
            val x = XOrig(pass) + (i / 3) * XStep(pass)
            val y = YOrig(pass) + py * YStep(pass)
            px(id, y, x, i % 3).toInt
          }
          bos.write(filterImage(raw, bpp = 3, seed = pass))
        }
        pass += 1
      }
      bos.toByteArray
    }

    private val Sig = Array[Byte](
      0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

    def payload(id: Long, text: String): Array[Byte] = (id % 4) match {
      case 0 => // indexed color: PLTE + 8-bit index scanlines
        Sig ++ ihdr(width(id), height(id), colorType = 3, interlace = 0) ++
          plte(id) ++ chunk("IDAT", deflate(paletteStream(id, poison = -1))) ++
          chunk("IEND", Array.emptyByteArray)
      case 1 => // Adam7 interlaced truecolor
        Sig ++ ihdr(width(id), height(id), colorType = 2, interlace = 1) ++
          chunk("IDAT", deflate(adam7Stream(id))) ++
          chunk("IEND", Array.emptyByteArray)
      case 2 => // MALFORMED: a pixel indexes past the palette — decode
        // must fail closed, never read out of bounds or emit partials
        Sig ++ ihdr(width(id), height(id), colorType = 3, interlace = 0) ++
          plte(id) ++
          chunk("IDAT", deflate(paletteStream(id, poison = palSize(id)))) ++
          chunk("IEND", Array.emptyByteArray)
      case _ => // opaque non-image payload
        Array[Byte](0) ++ text.getBytes("UTF-8")
    }
  }

  /** Decoded stats for a variant PNG: geometry, color type, palette
    * size (0 when truecolor), interlace flag, per-channel sums over the
    * FINAL RGB image and BOTH positional moments — Σ y·(r+g+b) catches
    * a pass deposited on the wrong rows, Σ x·(r+g+b) one deposited at
    * the wrong columns (channel sums alone are permutation-blind). */
  private[graft] case class PngVariantStats(w: Long, h: Long, nPx: Long,
      colorType: Long, palSize: Long, interlaced: Long,
      sumR: Long, sumG: Long, sumB: Long, ysumLum: Long, xsumLum: Long)

  /** The variant-PNG implementation of the seam: the q115 chunk walk
    * extended with PLTE handling (indexed color, out-of-range indexes
    * fail closed) and Adam7 reconstruction (per-pass unfilter with the
    * PASS's own neighbors, then the spec's origin/step deposit back to
    * final coordinates). Accepts 8-bit color types 2 and 3 at either
    * interlace method; everything else — and any CRC/length/zlib/
    * filter-type defect — degrades to None. Row-local, distributes
    * with the rows. */
  private[graft] object PngVariantDecoder extends PayloadDecoder[PngVariantStats] {
    val format = "png"
    import PngVariantBytes.{XOrig, YOrig, XStep, YStep}

    def decode(b: Array[Byte]): Option[PngVariantStats] = {
      if (b.length < 8) return None
      val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0D, 0x0A, 0x1A, 0x0A)
      var i = 0
      while (i < 8) { if ((b(i) & 0xFF) != sig(i)) return None; i += 1 }
      def be32(o: Int): Long =
        ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
          ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
      var pos = 8
      var w = -1L; var h = -1L; var colorType = -1; var interlace = -1
      var palette: Array[Int] = null // flat r,g,b triples
      var sawEnd = false
      val idat = new java.io.ByteArrayOutputStream()
      while (!sawEnd) {
        if (pos + 12 > b.length) return None
        val len = be32(pos)
        if (len < 0 || pos + 12 + len > b.length) return None
        val n = len.toInt
        val typ = new String(b, pos + 4, 4, "US-ASCII")
        val crc = new java.util.zip.CRC32()
        crc.update(b, pos + 4, 4 + n)
        if (crc.getValue != be32(pos + 8 + n)) return None
        typ match {
          case "IHDR" =>
            if (n != 13) return None
            w = be32(pos + 8); h = be32(pos + 12)
            val depth = b(pos + 16) & 0xFF
            colorType = b(pos + 17) & 0xFF
            val comp = b(pos + 18) & 0xFF
            val filt = b(pos + 19) & 0xFF
            interlace = b(pos + 20) & 0xFF
            if (depth != 8 || (colorType != 2 && colorType != 3) ||
              comp != 0 || filt != 0 || interlace > 1) return None
          case "PLTE" =>
            if (n % 3 != 0 || n == 0 || n > 768 || idat.size() > 0) return None
            palette = Array.tabulate(n)(j => b(pos + 8 + j) & 0xFF)
          case "IDAT" =>
            if (colorType == 3 && palette == null) return None
            idat.write(b, pos + 8, n)
          case "IEND" => sawEnd = true
          case _ => () // ancillary chunk: skip
        }
        pos += 12 + n
      }
      if (w <= 0 || h <= 0 || w > (1L << 20) || h > (1L << 20)) return None
      if (colorType == 3 && palette == null) return None
      val bpp = if (colorType == 3) 1 else 3
      // expected decompressed length: interlace 0 is one sub-image;
      // Adam7 sums the 7 non-empty passes
      def passDims(p: Int): (Int, Int) = (
        ((w.toInt - XOrig(p) + XStep(p) - 1) / XStep(p)).max(0),
        ((h.toInt - YOrig(p) + YStep(p) - 1) / YStep(p)).max(0))
      val expected =
        if (interlace == 0) h * (1 + bpp * w)
        else (0 until 7).map { p =>
          val (pw, ph) = passDims(p)
          if (pw > 0 && ph > 0) ph.toLong * (1 + bpp * pw) else 0L
        }.sum
      // overflow guard (the q115 fix): per-dimension caps still allow
      // expected past Int range — a declared-huge corrupt header must
      // degrade to None, not throw on array allocation
      if (expected > (1L << 28)) return None // 256 MiB decoded cap
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      val raw = new Array[Byte](expected.toInt)
      val got = try {
        var off = 0
        while (off < raw.length && !inf.finished()) {
          val k = inf.inflate(raw, off, raw.length - off)
          // k == 0 covers truncated input (needsInput), a preset-
          // dictionary header (needsDictionary — never valid in PNG),
          // and any other stall: fail closed, never spin
          if (k == 0) return None
          off += k
        }
        // the stream must END here: reject both extra decompressed
        // bytes AND a stream cut off exactly at the expected length
        // (finished() proves the final block + adler32 were seen)
        if (inf.inflate(new Array[Byte](1)) != 0 || !inf.finished())
          return None
        off
      } catch { case _: java.util.zip.DataFormatException => return None }
      finally inf.end()
      if (got != expected) return None

      // unfilter one sub-image in place from `raw` at stream offset
      // `off`; returns the reconstructed rows
      def unfilter(off: Int, pw: Int, ph: Int): Option[Array[Array[Int]]] = {
        val bpr = bpp * pw
        val img = Array.ofDim[Int](ph, bpr)
        var y = 0
        while (y < ph) {
          val ft = raw(off + y * (1 + bpr)) & 0xFF
          if (ft > 4) return None
          var i = 0
          while (i < bpr) {
            val f = raw(off + y * (1 + bpr) + 1 + i) & 0xFF
            val left = if (i >= bpp) img(y)(i - bpp) else 0
            val up = if (y > 0) img(y - 1)(i) else 0
            val ul = if (y > 0 && i >= bpp) img(y - 1)(i - bpp) else 0
            val v = ft match {
              case 0 => f
              case 1 => f + left
              case 2 => f + up
              case 3 => f + (left + up) / 2
              case _ =>
                val p = left + up - ul
                val (pa, pb, pc) =
                  (math.abs(p - left), math.abs(p - up), math.abs(p - ul))
                val pred = if (pa <= pb && pa <= pc) left
                  else if (pb <= pc) up else ul
                f + pred
            }
            img(y)(i) = v & 0xFF
            i += 1
          }
          y += 1
        }
        Some(img)
      }

      // final-coordinate RGB accumulation
      var (sr, sg, sb, yl, xl) = (0L, 0L, 0L, 0L, 0L)
      def addPixel(y: Long, x: Long, r: Long, g: Long, bl: Long): Unit = {
        sr += r; sg += g; sb += bl
        yl += y * (r + g + bl); xl += x * (r + g + bl)
      }
      def rgbOf(img: Array[Array[Int]], py: Int, pxi: Int): Option[(Long, Long, Long)] =
        if (colorType == 2)
          Some((img(py)(3 * pxi).toLong, img(py)(3 * pxi + 1).toLong,
            img(py)(3 * pxi + 2).toLong))
        else {
          val j = img(py)(pxi)
          if (3 * j + 2 >= palette.length) None // index past the palette
          else Some((palette(3 * j).toLong, palette(3 * j + 1).toLong,
            palette(3 * j + 2).toLong))
        }

      if (interlace == 0) {
        val img = unfilter(0, w.toInt, h.toInt).getOrElse(return None)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val (r, g, bl) = rgbOf(img, y, x).getOrElse(return None)
            addPixel(y.toLong, x.toLong, r, g, bl)
            x += 1
          }
          y += 1
        }
      } else {
        var off = 0
        var p = 0
        while (p < 7) {
          val (pw, ph) = passDims(p)
          if (pw > 0 && ph > 0) {
            val img = unfilter(off, pw, ph).getOrElse(return None)
            var py = 0
            while (py < ph) {
              var pxi = 0
              while (pxi < pw) {
                val (r, g, bl) = rgbOf(img, py, pxi).getOrElse(return None)
                addPixel((YOrig(p) + py.toLong * YStep(p)),
                  (XOrig(p) + pxi.toLong * XStep(p)), r, g, bl)
                pxi += 1
              }
              py += 1
            }
            off += ph * (1 + bpp * pw)
          }
          p += 1
        }
      }
      Some(PngVariantStats(w, h, w * h, colorType.toLong,
        if (palette == null) 0L else palette.length / 3L,
        interlace.toLong, sr, sg, sb, yl, xl))
    }
  }

  /** q116: PNG VARIANT decode — indexed color and Adam7 interlacing,
    * the two core paths the canonical q115 tier excludes. The oracle
    * restates the FINAL RGB image (palette lookups expanded, pixels at
    * final coordinates), so a wrong PLTE offset, an out-of-range index
    * not failing closed, a mis-sized pass, or a pass deposited at the
    * wrong origin/step all hash-fail — the x and y moments make
    * deposit geometry part of the gate (channel sums alone are
    * permutation-blind). Scale shape: row-local mapPartitions, no
    * shuffle before the presentation sort (the q98/q114/q115 shape). */
  def q116PngVariants(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { batch =>
        batch.map { case (id, text) =>
          val bytes = PngVariantBytes.payload(id, text)
          PngVariantDecoder.decode(bytes) match {
            case Some(st) =>
              (id, PngVariantDecoder.format, Option(st.colorType),
                Option(st.palSize), Option(st.interlaced), Option(st.w),
                Option(st.h), Option(st.nPx), Option(st.sumR), Option(st.sumG),
                Option(st.sumB), Option(st.ysumLum), Option(st.xsumLum))
            case None =>
              (id, "unknown", None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long], None: Option[Long])
          }
        }
      }
      .toDF("doc_id", "format", "color_type", "pal_size", "interlaced",
        "img_w", "img_h", "n_px", "sum_r", "sum_g", "sum_b", "ysum_lum",
        "xsum_lum")
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "q70_binary_meta" -> (q70BinaryMeta _),
    "q71_binary_decode_batch" -> (q71BinaryDecodeBatch _),
    "q72_frame_sample" -> (q72FrameSample _),
    "q98_image_header" -> (q98ImageHeader _),
    "q105_wav_header" -> (q105WavHeader _),
    "q113_gif_header" -> (q113GifHeader _),
    "q114_bmp_pixels" -> (q114BmpPixels _),
    "q115_png_pixels" -> (q115PngPixels _),
    "q116_png_variants" -> (q116PngVariants _),
    "q117_wav_pcm" -> (q117WavPcm _),
    "q118_mp4_boxes" -> (q118Mp4Boxes _))

  // Byte-stride sums in DuckDB: bytes via hex-pair extraction from the
  // UTF-8 encoding, summed per stride — mirrors the Spark-side stub
  // decoder exactly (integer accumulators, so values are engine-portable).
  // list_sum over BIGINT returns HUGEINT (lands as float64 in the
  // comparator) — cast back to BIGINT to hash-match Spark's LongType.
  private def strideSumSql(k: Int): String =
    s"CAST(COALESCE(list_sum([CAST(('0x' || substring(h, 2*i+1, 2)) AS BIGINT) " +
      s"for i in range(nb) if i % 8 = $k]), 0) AS BIGINT) AS f$k"

  val oracleSql: Map[String, String] = Map(
    // q118's twin restates the container CONSTRUCTION — timescale /
    // duration / track-id / mdat-byte arithmetic; the box tree, the
    // size forms and the versioned offsets are the ENGINE's problem.
    // duration_ms is floor division (both engines); mdat_sum expands
    // the byte arithmetic over the length range.
    "q118_mp4_boxes" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    600 + (doc_id * 13) % 1000 AS ts,
        |    1000 + (doc_id * 97) % 100000 AS dur,
        |    1 + doc_id % 3 AS nt,
        |    10 + doc_id % 50 AS ml,
        |    doc_id % 4 AS cls
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(COALESCE(list_sum([(doc_id + j) % 251 for j in range(ml)]), 0)
        |      AS BIGINT) AS msum
        |  FROM p WHERE cls <= 1)
        |SELECT p.doc_id,
        |  CASE WHEN cls <= 1 THEN 'mp4' ELSE 'unknown' END AS format,
        |  CASE WHEN cls <= 1 THEN 'isom' END AS brand,
        |  CAST(CASE WHEN cls <= 1 THEN ts END AS BIGINT) AS timescale,
        |  CAST(CASE WHEN cls <= 1 THEN dur END AS BIGINT) AS duration_ticks,
        |  CAST(CASE WHEN cls <= 1 THEN dur * 1000 // ts END AS BIGINT)
        |    AS duration_ms,
        |  CAST(CASE WHEN cls <= 1 THEN nt END AS BIGINT) AS n_traks,
        |  CAST(CASE WHEN cls <= 1 THEN nt * (nt + 1) // 2 END AS BIGINT)
        |    AS trak_id_sum,
        |  CAST(CASE WHEN cls <= 1 THEN ml END AS BIGINT) AS mdat_bytes,
        |  CAST(m.msum AS BIGINT) AS mdat_sum
        |FROM p LEFT JOIN m ON p.doc_id = m.doc_id
        |ORDER BY p.doc_id""".stripMargin,
    // q117's twin restates the WAVEFORM construction: per-doc expansion
    // of the signed sample arithmetic over the frame range, per-channel
    // integer sum/min/max and the frame-weighted order moment — the
    // RIFF layout, interleave, endianness and sign extension are all
    // the ENGINE's problem. The truncated-declaration class (2) and the
    // opaque class (3) must degrade to 'unknown' with null stats.
    "q117_wav_pcm" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    50 + (doc_id * 31) % 200 AS nf,
        |    doc_id % 4 AS cls
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, cls, unnest(range(0, nf)) AS i
        |  FROM p WHERE cls <= 1),
        |v AS (
        |  SELECT doc_id, cls, i,
        |    ((doc_id + 37*i) % 65521) - 32760 AS vl,
        |    ((doc_id + 37*i + 101) % 65521) - 32760 AS vr
        |  FROM f),
        |agg AS (
        |  SELECT doc_id,
        |    sum(vl) AS sl, min(vl) AS nl, max(vl) AS xl, sum(i * vl) AS im,
        |    sum(vr) AS sr, min(vr) AS nr, max(vr) AS xr
        |  FROM v GROUP BY doc_id)
        |SELECT p.doc_id,
        |  CASE WHEN cls <= 1 THEN 'wav' ELSE 'unknown' END AS format,
        |  CAST(CASE WHEN cls <= 1 THEN cls + 1 END AS BIGINT) AS n_channels,
        |  CAST(CASE WHEN cls <= 1 THEN 8000 END AS BIGINT) AS sample_rate,
        |  CAST(CASE WHEN cls <= 1 THEN nf END AS BIGINT) AS n_frames,
        |  CAST(agg.sl AS BIGINT) AS sum_l,
        |  CAST(agg.nl AS BIGINT) AS min_l,
        |  CAST(agg.xl AS BIGINT) AS max_l,
        |  CAST(agg.im AS BIGINT) AS imoment_l,
        |  CAST(CASE WHEN cls = 1 THEN agg.sr END AS BIGINT) AS sum_r,
        |  CAST(CASE WHEN cls = 1 THEN agg.nr END AS BIGINT) AS min_r,
        |  CAST(CASE WHEN cls = 1 THEN agg.xr END AS BIGINT) AS max_r
        |FROM p LEFT JOIN agg ON p.doc_id = agg.doc_id
        |ORDER BY p.doc_id""".stripMargin,
    // q116's twin restates the FINAL RGB image of both variant classes:
    // the palette class expands every pixel's PLTE lookup (index
    // arithmetic -> entry arithmetic), the interlaced class states the
    // truecolor values at their FINAL coordinates — pass geometry,
    // filters and the compressed wire format are all the ENGINE's
    // problem. The out-of-range-index class (2) and the opaque class
    // (3) must degrade to 'unknown' with null stats.
    "q116_png_variants" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    2 + (doc_id * 37) % 8 AS w,
        |    2 + (doc_id * 53) % 7 AS h,
        |    2 + doc_id % 13 AS ps,
        |    doc_id % 4 AS cls
        |  FROM documents),
        |r1 AS (
        |  SELECT doc_id, w, h, ps, cls, unnest(range(0, h)) AS y
        |  FROM p WHERE cls <= 1),
        |px AS (SELECT doc_id, ps, cls, y, unnest(range(0, w)) AS x FROM r1),
        |v AS (
        |  SELECT doc_id, y, x,
        |    CASE WHEN cls = 0 THEN (doc_id + 11 * ((doc_id + 7*y + 3*x) % ps)) % 251
        |         ELSE (doc_id + 17*y + 3*x) % 251 END AS vr,
        |    CASE WHEN cls = 0 THEN (doc_id + 11 * ((doc_id + 7*y + 3*x) % ps) + 5) % 251
        |         ELSE (doc_id + 17*y + 3*x + 7) % 251 END AS vg,
        |    CASE WHEN cls = 0 THEN (doc_id + 11 * ((doc_id + 7*y + 3*x) % ps) + 10) % 251
        |         ELSE (doc_id + 17*y + 3*x + 14) % 251 END AS vb
        |  FROM px),
        |agg AS (
        |  SELECT doc_id,
        |    sum(vr) AS sr, sum(vg) AS sg, sum(vb) AS sb,
        |    sum(y * (vr + vg + vb)) AS yl,
        |    sum(x * (vr + vg + vb)) AS xl
        |  FROM v GROUP BY doc_id)
        |SELECT p.doc_id,
        |  CASE WHEN cls <= 1 THEN 'png' ELSE 'unknown' END AS format,
        |  CAST(CASE WHEN cls = 0 THEN 3 WHEN cls = 1 THEN 2 END AS BIGINT)
        |    AS color_type,
        |  CAST(CASE WHEN cls = 0 THEN ps WHEN cls = 1 THEN 0 END AS BIGINT)
        |    AS pal_size,
        |  CAST(CASE WHEN cls <= 1 THEN cls END AS BIGINT) AS interlaced,
        |  CAST(CASE WHEN cls <= 1 THEN w END AS BIGINT) AS img_w,
        |  CAST(CASE WHEN cls <= 1 THEN h END AS BIGINT) AS img_h,
        |  CAST(CASE WHEN cls <= 1 THEN w * h END AS BIGINT) AS n_px,
        |  CAST(agg.sr AS BIGINT) AS sum_r,
        |  CAST(agg.sg AS BIGINT) AS sum_g,
        |  CAST(agg.sb AS BIGINT) AS sum_b,
        |  CAST(agg.yl AS BIGINT) AS ysum_lum,
        |  CAST(agg.xl AS BIGINT) AS xsum_lum
        |FROM p LEFT JOIN agg ON p.doc_id = agg.doc_id
        |ORDER BY p.doc_id""".stripMargin,
    // q115's twin restates the PNG payload CONSTRUCTION at the RAW
    // pixel layer — the compressed wire format is the ENGINE's problem
    // (inflate + unfilter must reconstruct these exact values): per-doc
    // w x h expansion of the pixel arithmetic, channel sums, and the
    // row-weighted moment (PNG rows are top-down — no flip). The
    // malformed-IDAT class (2) and the opaque class (3) must degrade
    // to 'unknown' with null stats.
    "q115_png_pixels" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    2 + (doc_id * 41) % 7 AS w,
        |    2 + (doc_id * 59) % 6 AS h
        |  FROM documents),
        |r1 AS (
        |  SELECT doc_id, w, h, unnest(range(0, h)) AS y
        |  FROM p WHERE doc_id % 4 <= 1),
        |px AS (SELECT doc_id, h, y, unnest(range(0, w)) AS x FROM r1),
        |v AS (
        |  SELECT doc_id, y,
        |    (doc_id + 13 * y + 3 * x) % 251 AS vr,
        |    (doc_id + 13 * y + 3 * x + 5) % 251 AS vg,
        |    (doc_id + 13 * y + 3 * x + 10) % 251 AS vb
        |  FROM px),
        |agg AS (
        |  SELECT doc_id,
        |    sum(vr) AS sr, sum(vg) AS sg, sum(vb) AS sb,
        |    sum(y * (vr + vg + vb)) AS yl
        |  FROM v GROUP BY doc_id)
        |SELECT p.doc_id,
        |  CASE WHEN p.doc_id % 4 <= 1 THEN 'png' ELSE 'unknown' END AS format,
        |  CAST(CASE WHEN p.doc_id % 4 <= 1 THEN w END AS BIGINT) AS img_w,
        |  CAST(CASE WHEN p.doc_id % 4 <= 1 THEN h END AS BIGINT) AS img_h,
        |  CAST(CASE WHEN p.doc_id % 4 <= 1 THEN w * h END AS BIGINT) AS n_px,
        |  CAST(CASE WHEN p.doc_id % 4 <= 1 THEN h * (1 + 3 * w) END AS BIGINT)
        |    AS raw_len,
        |  CAST(agg.sr AS BIGINT) AS sum_r,
        |  CAST(agg.sg AS BIGINT) AS sum_g,
        |  CAST(agg.sb AS BIGINT) AS sum_b,
        |  CAST(agg.yl AS BIGINT) AS ysum_lum
        |FROM p LEFT JOIN agg ON p.doc_id = agg.doc_id
        |ORDER BY p.doc_id""".stripMargin,
    // q114's twin restates the BMP payload CONSTRUCTION, pixels
    // included: per-doc w x h expansion of the pixel-value arithmetic
    // (two unnest(range) stages, the q72 pattern), channel sums, and
    // the orientation moment with the bottom-up flip applied for class
    // 0 and not for the top-down class 1. The engine PARSES the real
    // layout, so a wrong stride, pad bytes summed as pixels, a missed
    // row flip, or unchecked truncation all hash-fail.
    "q114_bmp_pixels" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    2 + (doc_id * 37) % 7 AS w,
        |    2 + (doc_id * 53) % 6 AS h,
        |    octet_length(encode(text)) AS tb
        |  FROM documents),
        |q AS (SELECT doc_id, w, h, tb, ((3 * w + 3) // 4) * 4 AS st FROM p),
        |r1 AS (
        |  SELECT doc_id, w, h, unnest(range(0, h)) AS fr
        |  FROM q WHERE doc_id % 4 <= 1),
        |px AS (SELECT doc_id, h, fr, unnest(range(0, w)) AS x FROM r1),
        |v AS (
        |  SELECT doc_id, h, fr,
        |    (doc_id + 11 * fr + 5 * x) % 251 AS vb,
        |    (doc_id + 11 * fr + 5 * x + 7) % 251 AS vg,
        |    (doc_id + 11 * fr + 5 * x + 14) % 251 AS vr
        |  FROM px),
        |agg AS (
        |  SELECT doc_id,
        |    sum(vb) AS sb, sum(vg) AS sg, sum(vr) AS sr,
        |    sum((CASE WHEN doc_id % 4 = 0 THEN h - 1 - fr ELSE fr END)
        |      * (vb + vg + vr)) AS yl
        |  FROM v GROUP BY doc_id)
        |SELECT q.doc_id,
        |  CAST(CASE q.doc_id % 4
        |    WHEN 0 THEN 54 + st * h
        |    WHEN 1 THEN 54 + st * h
        |    WHEN 2 THEN 58
        |    ELSE tb + 1 END AS BIGINT) AS n_bytes,
        |  CASE WHEN q.doc_id % 4 <= 1 THEN 'bmp' ELSE 'unknown' END AS format,
        |  CAST(CASE WHEN q.doc_id % 4 <= 1 THEN w END AS BIGINT) AS img_w,
        |  CAST(CASE WHEN q.doc_id % 4 <= 1 THEN h END AS BIGINT) AS img_h,
        |  CAST(CASE WHEN q.doc_id % 4 <= 1 THEN w * h END AS BIGINT) AS n_px,
        |  CAST(agg.sb AS BIGINT) AS sum_b,
        |  CAST(agg.sg AS BIGINT) AS sum_g,
        |  CAST(agg.sr AS BIGINT) AS sum_r,
        |  CAST(agg.yl AS BIGINT) AS ysum_lum
        |FROM q LEFT JOIN agg ON q.doc_id = agg.doc_id
        |ORDER BY q.doc_id""".stripMargin,
    // q113's twin restates the GIF payload CONSTRUCTION: signature (6)
    // + logical screen descriptor (7) + global color table
    // (3 * 2^(n+1), class 0 only); the truncated class stops at 9
    // bytes; the opaque class is text + 1 NUL lead byte.
    "q113_gif_header" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(1 + (doc_id // 4) % 3 AS BIGINT) AS n,
        |    8 + (doc_id * 4391) % 1200 AS w,
        |    8 + (doc_id * 6869) % 900 AS h,
        |    octet_length(encode(text)) AS tb
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(CASE doc_id % 4
        |    WHEN 0 THEN 13 + 3 * (1 << (n + 1))
        |    WHEN 1 THEN 13
        |    WHEN 2 THEN 9
        |    ELSE tb + 1 END AS BIGINT) AS n_bytes,
        |  CASE WHEN doc_id % 4 <= 1 THEN 'gif' ELSE 'unknown' END AS format,
        |  CASE doc_id % 4 WHEN 0 THEN '89a' WHEN 1 THEN '87a' END AS gif_version,
        |  CAST(CASE WHEN doc_id % 4 <= 1 THEN w END AS BIGINT) AS img_w,
        |  CAST(CASE WHEN doc_id % 4 <= 1 THEN h END AS BIGINT) AS img_h,
        |  CAST(CASE WHEN doc_id % 4 = 0 THEN 1 << (n + 1)
        |       WHEN doc_id % 4 = 1 THEN 0 END AS BIGINT) AS palette_colors
        |FROM p ORDER BY doc_id""".stripMargin,
    // DuckDB has no BLOB substring; the corpus is verified pure ASCII
    // (octet_length(encode(text)) == length(text) for every row), so
    // char slicing on the VARCHAR equals the Spark side's byte slicing
    // and md5(VARCHAR) hashes the same bytes.
    "q72_frame_sample" ->
      """WITH b AS (
        |  SELECT doc_id, text, CAST(octet_length(encode(text)) AS BIGINT) AS nb
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, text,
        |    unnest(range(0, CAST(ceil(CAST(nb AS DOUBLE) / 64) AS BIGINT))) AS frame_idx
        |  FROM b)
        |SELECT doc_id, frame_idx,
        |  CAST(length(substring(text, CAST(frame_idx * 64 + 1 AS BIGINT), 64)) AS BIGINT)
        |    AS frame_bytes,
        |  md5(substring(text, CAST(frame_idx * 64 + 1 AS BIGINT), 64)) AS frame_md5
        |FROM f WHERE frame_idx % 4 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "q71_binary_decode_batch" ->
      s"""WITH b AS (
         |  SELECT doc_id, hex(encode(text)) AS h,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS nb
         |  FROM documents)
         |SELECT doc_id, nb AS n_bytes,
         |  ${(0 until 8).map(strideSumSql).mkString(",\n  ")}
         |FROM b ORDER BY doc_id""".stripMargin,
    "q70_binary_meta" ->
      s"""SELECT doc_id,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  lower(hex(encode(substring(text, 1, 4)))) AS magic_hex,
         |  md5(text) AS content_md5,
         |  320 + (CAST(octet_length(encode(text)) AS BIGINT) % 32) * 16 AS decode_w,
         |  240 + (${TextOps.sqlPolyHash("text", 31L)} % 24) * 10 AS decode_h
         |FROM documents ORDER BY doc_id""".stripMargin,
    // q98's twin restates the payload CONSTRUCTION arithmetic (never the
    // parse): PNG = 33 header bytes (8 sig + 25 IHDR chunk), JPEG =
    // 39 + 3·ncomp (SOI + APP0 + COM + SOF0), opaque = the text bytes.
    // The engine side actually parses those layouts, so a decoder bug
    // (wrong offset, wrong endianness, broken marker walk) hash-fails.
    // q105's twin restates the WAV payload CONSTRUCTION: canonical
    // layout is 12 (RIFF/WAVE) + 24 (fmt) + 8 + data bytes; the JUNK
    // variant adds 14 (8 + 5 + 1 pad); the truncated variant stops at
    // 24 bytes; the opaque class is text + 1 NUL lead byte.
    // duration = floor(n_frames * 1000 / rate) because the
    // block align cancels exactly in data_size*1000/(rate*align).
    "q105_wav_header" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    1 + (doc_id // 4) % 2 AS ch,
        |    CASE WHEN doc_id % 4 = 0 THEN 16 ELSE 8 END AS bt,
        |    8000 + (doc_id * 2711) % 40001 AS rate,
        |    16 + (doc_id * 127) % 257 AS nf,
        |    octet_length(encode(text)) AS tb
        |  FROM documents),
        |q AS (SELECT *, (ch * bt) // 8 AS al FROM p)
        |SELECT doc_id,
        |  CAST(CASE doc_id % 4
        |    WHEN 0 THEN 44 + nf * al
        |    WHEN 1 THEN 58 + nf * al
        |    WHEN 2 THEN 24
        |    ELSE tb + 1 END AS BIGINT) AS n_bytes,
        |  CASE WHEN doc_id % 4 <= 1 THEN 'wav' ELSE 'unknown' END AS format,
        |  CAST(CASE WHEN doc_id % 4 <= 1 THEN ch END AS BIGINT) AS channels,
        |  CAST(CASE WHEN doc_id % 4 <= 1 THEN rate END AS BIGINT) AS sample_rate,
        |  CAST(CASE WHEN doc_id % 4 <= 1 THEN bt END AS BIGINT) AS bits,
        |  CAST(CASE WHEN doc_id % 4 <= 1 THEN nf END AS BIGINT) AS n_frames,
        |  CAST(CASE WHEN doc_id % 4 <= 1 THEN (nf * 1000) // rate END AS BIGINT)
        |    AS duration_ms
        |FROM q ORDER BY doc_id""".stripMargin,
    "q98_image_header" ->
      """SELECT doc_id,
        |  CAST(CASE doc_id % 3
        |    WHEN 0 THEN 33
        |    WHEN 1 THEN 39 + 3 * (CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END)
        |    ELSE octet_length(encode(text)) END AS BIGINT) AS n_bytes,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |    ELSE 'unknown' END AS format,
        |  CAST(CASE WHEN doc_id % 3 < 2
        |    THEN 16 + (doc_id * 7919) % 1017 END AS BIGINT) AS img_w,
        |  CAST(CASE WHEN doc_id % 3 < 2
        |    THEN 16 + (doc_id * 104729) % 761 END AS BIGINT) AS img_h,
        |  CAST(CASE WHEN doc_id % 3 = 0
        |      THEN CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 4 END
        |    WHEN doc_id % 3 = 1
        |      THEN CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END
        |    END AS BIGINT) AS channels
        |FROM documents ORDER BY doc_id""".stripMargin)
}
