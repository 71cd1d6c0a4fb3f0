package graft.streaming

import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** CSV → Kafka publisher — the write side of the ingest wiring
  * ([[KafkaSource]] is the read side).
  *
  * Reference origin: common/CsvKafkaPublisher.scala — a single-threaded
  * driver loop (read file, skip headers and short lines, key each line
  * by its hashCode, producer.send, sleep per record). Re-expressed
  * Spark-native: the CSV directory is a (streaming or batch) source,
  * the header/short-line rules are a filter on the distributed frame,
  * and the publish is `write.format("kafka")` — the cluster publishes
  * partitions in parallel, and rate control is declarative
  * (`maxFilesPerTrigger` + trigger interval) instead of Thread.sleep.
  *
  * The (key, value) frame is the seam the specs drive (this container
  * ships no Kafka connector jar or broker; `publish`/`publishStream`
  * only assemble the public writer API). Keying by a hash of the line
  * keeps the reference's partition-spreading behavior but with the
  * engine-portable polynomial hash rather than JVM hashCode.
  */
object KafkaPublisher {

  /** Producer-side options, mirroring the reference CLI's knobs
    * (acks / linger.ms / batch.size; CsvKafkaPublisher.scala:76-101). */
  final case class KafkaPublishOptions(
      bootstrapServers: String,
      topic: String,
      acks: String = "all",
      lingerMs: Long = 0L,
      batchSize: Long = 16384L,
      extra: Map[String, String] = Map.empty) {

    /** Writer option map (public spark-sql-kafka producer keys). */
    def asMap: Map[String, String] = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "topic" -> topic,
      "kafka.acks" -> acks,
      "kafka.linger.ms" -> lingerMs.toString,
      "kafka.batch.size" -> batchSize.toString) ++ extra
  }

  /** CSV lines → the Kafka record frame (key, value): header lines and
    * lines shorter than 10 chars are dropped (publishTaxiRecord's
    * rules, CsvKafkaPublisher.scala:66-74), the key is the line's
    * portable hash rendered as a string — same spread-by-content-hash
    * partitioning as the reference's line.hashCode key. */
  def frame(lines: Dataset[String], headerPrefix: String): DataFrame =
    lines.toDF("line")
      .filter(!col("line").startsWith(headerPrefix) && length(col("line")) >= 10)
      .select(TextOps.polyHash61(col("line")).cast("string").as("key"),
        col("line").as("value"))

  /** Batch publish of a prepared frame. */
  def publish(frame: DataFrame, opts: KafkaPublishOptions): Unit =
    frame.write.format("kafka").options(opts.asMap).save()

  /** Streaming publish of a prepared frame (exactly-once bookkeeping
    * via the checkpoint, vs the reference's fire-and-forget loop). */
  def publishStream(frame: DataFrame, opts: KafkaPublishOptions,
      checkpoint: String): StreamingQuery =
    frame.writeStream.format("kafka").options(opts.asMap)
      .option("checkpointLocation", checkpoint).start()

  /** The reference CLI end-to-end: watch a CSV folder, frame each new
    * file's lines, publish — `maxFilesPerTrigger` is the declarative
    * replacement for sleep-per-record rate limiting. */
  def csvDirStream(spark: SparkSession, dir: String, headerPrefix: String,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    import spark.implicits._
    frame(spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dir).as[String], headerPrefix)
  }
}
