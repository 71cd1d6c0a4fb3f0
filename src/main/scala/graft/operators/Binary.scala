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
    * fixed-shape feature vector per item. The decoder body is a STUB
    * (deterministic bytes -> 8 floats; a real one would call an image/
    * audio library unavailable in this environment) but the plumbing —
    * schema, encoders, partitioning, batch iteration — is the real
    * production shape.
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
          // STUB decode: deterministic per-byte-stride sums, not a real
          // codec. Integer accumulators -> exact, engine-portable values.
          val features = Array.tabulate(8) { i =>
            var acc = 0L; var j = i
            while (j < bytes.length) { acc += bytes(j) & 0xFF; j += 8 }
            acc
          }
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

  val queries: Map[String, Q] = Map(
    "q70_binary_meta" -> (q70BinaryMeta _),
    "q71_binary_decode_batch" -> (q71BinaryDecodeBatch _),
    "q72_frame_sample" -> (q72FrameSample _))

  // Byte-stride sums in DuckDB: bytes via hex-pair extraction from the
  // UTF-8 encoding, summed per stride — mirrors the Spark-side stub
  // decoder exactly (integer accumulators, so values are engine-portable).
  // list_sum over BIGINT returns HUGEINT (lands as float64 in the
  // comparator) — cast back to BIGINT to hash-match Spark's LongType.
  private def strideSumSql(k: Int): String =
    s"CAST(COALESCE(list_sum([CAST(('0x' || substring(h, 2*i+1, 2)) AS BIGINT) " +
      s"for i in range(nb) if i % 8 = $k]), 0) AS BIGINT) AS f$k"

  val oracleSql: Map[String, String] = Map(
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
         |FROM documents ORDER BY doc_id""".stripMargin)
}
