package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** Search-index sink — the SolrSupport.indexDStreamOfDocs analog
  * (reference: common/SolrSupport.java, batch indexer with per-batch
  * flush; doc shape from NyTaxiYellowTripStreaming.scala:185-212
  * convertToSolRDocuments).
  *
  * Input contract: a streaming DataFrame with columns
  * `ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE`.
  * Each micro-batch is projected to search documents (synthesized id
  * `user_id,iso_ts`, ISO-8601 second-resolution time) and written as
  * JSON lines under `indexDir/batch_<id>/` — the seam where a
  * production deployment plugs a search-cluster client; the projection,
  * batching and checkpoint bookkeeping are the operator.
  */
object SearchDocSink {

  /** The index schema contract — the `solr/ny_taxi/schema.xml` analog
    * (a search collection pins every field's name and type up front;
    * `<uniqueKey>id</uniqueKey>` + typed stored fields). Documents the
    * sink emits MUST carry exactly these (name, type) pairs in this
    * order: [[writeTo]] enforces it per batch and the spec asserts it,
    * so a projection rename/retype fails loudly instead of silently
    * drifting the index. */
  val indexSchema: StructType = StructType(Seq(
    StructField("id", StringType), // uniqueKey: "user_id,iso_ts"
    StructField("user_id", LongType),
    StructField("event_time", StringType), // ISO-8601, second resolution
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** (name, type) conformance against [[indexSchema]] — nullability is
    * a storage hint, not part of the search contract. */
  def conforms(df: DataFrame): Boolean =
    df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      indexSchema.fields.map(f => (f.name, f.dataType)).toSeq

  /** Row → search-document projection (same shape as q23_search_docs). */
  def toDocs(events: DataFrame): DataFrame = {
    val iso = date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    events.select(
      concat(col("user_id").cast("string"), lit(","), iso).as("id"),
      col("user_id"), iso.as("event_time"), col("event_type"), col("value"))
  }

  def writeTo(in: DataFrame, indexDir: String,
      checkpointDir: String): StreamingQuery =
    in.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val docs = toDocs(batch)
        require(conforms(docs),
          s"search docs drifted from the index schema: ${docs.schema.sql} " +
            s"vs ${indexSchema.sql}")
        docs.toJSON.write.mode("overwrite")
          .text(s"$indexDir/batch_$batchId")
      }
      .start()

  /** The WIRE transport for the seam — the part of SolrSupport.java's
    * CloudSolrServer path the JSON-lines sink stops short of: each
    * EXECUTOR partition posts its documents to the index endpoint as
    * NDJSON update batches of `batchSize` (SolrSupport.java:79-135
    * batches per partition and flushes per batch; same shape, HTTP
    * instead of the SolrJ client, pure-JDK java.net.http). Driver-free
    * by construction: the rows never leave the executors, so indexing
    * bandwidth scales with partitions, not with one client.
    *
    * Idempotence contract: the batch id rides an `X-Graft-Batch` header
    * and the doc ids are content-derived, so an at-least-once replay
    * re-posts the same ids — a search index upserts by uniqueKey (the
    * schema.xml rule), making re-delivery harmless; the spec's stub
    * server asserts exactly that (same ids, no duplicates after
    * dedup-by-id). Failures: non-2xx responses throw, failing the task
    * and letting streaming retry the batch. */
  /** One client per executor JVM (lazy, thread-safe): a client per
    * partition per micro-batch leaks selector threads across thousands
    * of triggers. Both timeouts are load-bearing — a wedged index
    * endpoint that accepts the TCP connection but never answers must
    * FAIL the task (so streaming retries the batch), not hang the
    * query forever (round-12 review finding). */
  private val RequestTimeout = java.time.Duration.ofSeconds(60)
  @transient private lazy val httpClient: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10))
      .build()

  def postPartition(rows: Iterator[String], endpoint: String,
      batchId: Long, batchSize: Int): Int = {
    var posted = 0
    rows.grouped(batchSize).foreach { group =>
      val body = group.mkString("\n")
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(endpoint))
        .timeout(RequestTimeout)
        .header("Content-Type", "application/x-ndjson")
        .header("X-Graft-Batch", batchId.toString)
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build()
      val resp = httpClient.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() / 100 == 2,
        s"index endpoint returned ${resp.statusCode()}: ${resp.body()}")
      posted += group.size
    }
    posted
  }

  /** Attach the HTTP transport to an event stream: per micro-batch,
    * project to index documents and post them partition-parallel. */
  def writeToHttp(in: DataFrame, endpoint: String, checkpointDir: String,
      batchSize: Int = 500): StreamingQuery =
    in.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val docs = toDocs(batch)
        require(conforms(docs),
          s"search docs drifted from the index schema: ${docs.schema.sql} " +
            s"vs ${indexSchema.sql}")
        docs.toJSON.rdd.foreachPartition(it =>
          { postPartition(it, endpoint, batchId, batchSize); () })
      }
      .start()
}
