package graft.streaming

import graft.streaming.Streams.OrderEvent
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Production Kafka ingest wiring for the streaming jobs.
  *
  * Every reference job reads its records from a Kafka topic
  * (common/CsvKafkaPublisher.scala:64-84 is the publisher;
  * ny_taxi/NyTaxiYellowTripStreaming.scala:96-120,
  * connected_car/ConnectedCarStreaming.scala and both FHWA jobs create
  * the direct stream). The Structured Streaming twin is
  * `spark.readStream.format("kafka")` (the public spark-sql-kafka
  * connector) followed by a value→typed-record parse; this object is
  * that builder.
  *
  * The seam stays the typed Dataset the [[Streams]] builders take:
  * production wires `orderEvents(raw(spark, opts))` into
  * [[Streams.entityStream]]; specs drive the SAME parse function through
  * a MemoryStream / file source (this container ships no Kafka connector
  * jar or broker, so `raw` itself cannot be exercised here — it only
  * assembles public, documented reader options).
  */
object KafkaSource {

  /** Connection + consumption options for one topic subscription.
    * Mirrors the reference's direct-stream setup: broker list + topic set
    * (NyTaxiYellowTripStreaming.scala:96-104), offset reset policy, and
    * the per-trigger rate cap a production job sets so one slow batch
    * cannot snowball. */
  final case class KafkaSourceOptions(
      bootstrapServers: String,
      topics: Seq[String],
      startingOffsets: String = "latest", // or "earliest" / per-partition JSON
      maxOffsetsPerTrigger: Option[Long] = None,
      failOnDataLoss: Boolean = true,
      extra: Map[String, String] = Map.empty) {

    /** The `readStream` option map (all public spark-sql-kafka keys). */
    def asMap: Map[String, String] = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topics.mkString(","),
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> failOnDataLoss.toString) ++
      maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++
      extra
  }

  /** The raw Kafka stream: (key, value, topic, partition, offset,
    * timestamp) exactly as the connector emits it. */
  def raw(spark: SparkSession, opts: KafkaSourceOptions): DataFrame =
    opts.asMap.foldLeft(spark.readStream.format("kafka")) {
      case (r, (k, v)) => r.option(k, v)
    }.load()

  /** Kafka record values as lines — the shape every reference job starts
    * from (the publisher writes one CSV line per message). */
  def lines(kafka: DataFrame): Dataset[String] = {
    import kafka.sparkSession.implicits._
    kafka.select(col("value").cast("string")).as[String]
  }

  /** Tolerant CSV line → OrderEvent parse, the q19 rules re-applied at
    * the stream boundary (CsvKafkaPublisher.scala:64-71): drop header
    * lines and lines shorter than 10 chars, default an empty status
    * field — a poison message must be skipped, not kill the query.
    * Columns: orderkey, custkey, status, totalprice, priority. */
  def orderEvents(lines: Dataset[String]): Dataset[OrderEvent] = {
    import lines.sparkSession.implicits._
    lines.toDF("line")
      .filter(!col("line").startsWith("o_orderkey") && length(col("line")) >= 10)
      .withColumn("f", split(col("line"), ","))
      // a long poison line can still have too few comma fields — filter
      // BEFORE indexing, because under ANSI f[i] out of bounds throws
      // (and try_cast would not catch its child's error)
      .filter(size(col("f")) >= 4)
      // try_cast, not cast: under ANSI a poison field would throw and
      // kill the streaming query; null-and-filter is the tolerant rule
      .select(
        expr("try_cast(f[1] AS BIGINT)").as("custkey"),
        expr("try_cast(f[3] AS DOUBLE)").as("amount"),
        when(element_at(col("f"), 3) === "", "0")
          .otherwise(element_at(col("f"), 3)).as("status"))
      .filter(col("custkey").isNotNull && col("amount").isNotNull)
      .as[OrderEvent]
  }

  /** End-to-end production builder: Kafka topic → typed entity updates.
    * The reference's whole NyTaxiYellowTripStreaming pipeline in one
    * call; attach [[UpsertSink.writeTo]] to store it. */
  def entityUpdatesFromKafka(spark: SparkSession, opts: KafkaSourceOptions)
      : Dataset[Streams.EntityUpdate] =
    Streams.entityStream(orderEvents(lines(raw(spark, opts))))
}
