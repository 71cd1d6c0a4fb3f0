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
    * production shape. Rows-only (spec-checked for shape/determinism). */
  def q71BinaryDecodeBatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          // STUB decode: deterministic per-byte-stride means, not a real codec
          val features = Array.tabulate(8) { i =>
            var acc = 0L; var j = i
            while (j < bytes.length) { acc += bytes(j) & 0xFF; j += 8 }
            (acc.toDouble / math.max(1, (bytes.length + 7 - i) / 8)).toFloat
          }
          (id, bytes.length.toLong, features)
        }
      }
      .toDF("doc_id", "n_bytes", "features")
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "q70_binary_meta" -> (q70BinaryMeta _),
    "q71_binary_decode_batch" -> (q71BinaryDecodeBatch _))

  val oracleSql: Map[String, String] = Map(
    "q70_binary_meta" ->
      s"""SELECT doc_id,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  lower(hex(encode(substring(text, 1, 4)))) AS magic_hex,
         |  md5(text) AS content_md5,
         |  320 + (CAST(octet_length(encode(text)) AS BIGINT) % 32) * 16 AS decode_w,
         |  240 + (${TextOps.sqlPolyHash("text", 31L)} % 24) * 10 AS decode_h
         |FROM documents ORDER BY doc_id""".stripMargin)
}
