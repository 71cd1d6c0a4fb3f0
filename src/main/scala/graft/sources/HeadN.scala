package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Sample-extraction readers: the first N lines of a text/CSV file and
  * of every entry in a zip archive, as Datasets.
  *
  * Reference origin: extra/ReadFirstNFromCsvFile.scala:10-31 and
  * extra/ReadFirstNFromZipFile.scala:12-51 — local-filesystem CLIs that
  * copy head samples into files. Re-expressed Spark-side so the sample
  * lands in a Dataset (write it wherever with `.write`):
  *
  *  - text/CSV: `spark.read.textFile(...).limit(n)` — Spark executes
  *    limit incrementally (scans only the partitions it needs), so
  *    heading a 100 TB path costs one partition's scan, not a full read.
  *  - zip: Spark ships no zip codec and zip entries are not splittable,
  *    so each archive is one `binaryFile` row streamed through a
  *    per-file ZipInputStream seam (the same partition-batched pattern
  *    as the q71 decode); only the first N lines per entry are read —
  *    the stream is abandoned early, never fully decompressed.
  */
object HeadN {

  /** First `n` lines of a text/CSV file (or glob) in file order. */
  def headLines(spark: SparkSession, path: String, n: Int): Dataset[String] =
    spark.read.textFile(path).limit(n)

  /** First `n` lines of EVERY entry of each zip archive under `path`:
    * (file, entry, line_no, line), line_no starting at 1. */
  def headZipEntries(spark: SparkSession, path: String, n: Int): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        val zin = new ZipInputStream(new java.io.ByteArrayInputStream(bytes))
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long, String)]
        var entry = zin.getNextEntry
        while (entry != null) {
          if (!entry.isDirectory) {
            val reader = new BufferedReader(
              new InputStreamReader(zin, StandardCharsets.UTF_8))
            var i = 0L
            var line = if (n > 0) reader.readLine() else null
            while (line != null && i < n) {
              i += 1
              out += ((file, entry.getName, i, line))
              line = if (i < n) reader.readLine() else null
            }
          }
          entry = zin.getNextEntry
        }
        zin.close()
        out
      }
      .toDF("file", "entry", "line_no", "line")
  }
}
