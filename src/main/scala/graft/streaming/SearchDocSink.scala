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
}
