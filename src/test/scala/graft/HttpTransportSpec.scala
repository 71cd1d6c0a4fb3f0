package graft

import graft.streaming.SearchDocSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/** The search seam carrying a REAL wire transport: an in-JVM HTTP stub
  * index (the offline stand-in for the reference's CloudSolrServer —
  * SolrSupport.java:79-135) receives executor-posted NDJSON update
  * batches. Asserts the framing (content type, batch header, one JSON
  * doc per line), delivery of every doc, the upsert-by-uniqueKey replay
  * contract, and the loud failure path. */
class HttpTransportSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Stub index server: collects raw NDJSON lines + headers; dedups by
    * the doc id field the way a search index's uniqueKey does. */
  private class StubIndex {
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val contentTypes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val batchHeaders = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var failAll = false
    private val server =
      com.sun.net.httpserver.HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/update", { exchange =>
      val body = new String(exchange.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      if (failAll) {
        exchange.sendResponseHeaders(503, -1)
      } else {
        body.split('\n').filter(_.nonEmpty).foreach(lines.add)
        Option(exchange.getRequestHeaders.getFirst("Content-Type"))
          .foreach(contentTypes.add)
        Option(exchange.getRequestHeaders.getFirst("X-Graft-Batch"))
          .foreach(batchHeaders.add)
        val ok = "{\"status\":0}".getBytes(StandardCharsets.UTF_8)
        exchange.sendResponseHeaders(200, ok.length)
        exchange.getResponseBody.write(ok)
      }
      exchange.close()
    })
    server.start()
    def endpoint: String =
      s"http://127.0.0.1:${server.getAddress.getPort}/update"
    def ids: Set[String] =
      lines.asScala.toSeq.flatMap(
        "\"id\":\"([^\"]+)\"".r.findFirstMatchIn(_).map(_.group(1))).toSet
    def stop(): Unit = server.stop(0)
  }

  test("executor partitions post NDJSON update batches the stub index receives") {
    implicit val sqlCtx = spark.sqlContext
    val idx = new StubIndex
    val ckpt = java.nio.file.Files.createTempDirectory("graft_http_").toString
    val in = MemoryStream[(Long, String, Double)]
    val df = in.toDS().toDF("user_id", "event_type", "value")
      .withColumn("ts", org.apache.spark.sql.functions.lit(
        java.sql.Timestamp.valueOf("2024-03-01 12:34:56")))
    val q = SearchDocSink.writeToHttp(df, idx.endpoint, ckpt, batchSize = 2)
    try {
      in.addData((7L, "purchase", 1.25), (9L, "error", 0.5), (11L, "view", 3.5))
      q.processAllAvailable()
      assert(idx.ids == Set("7,2024-03-01T12:34:56Z", "9,2024-03-01T12:34:56Z",
        "11,2024-03-01T12:34:56Z"), idx.ids.toString)
      assert(idx.contentTypes.asScala.forall(_ == "application/x-ndjson"))
      assert(idx.batchHeaders.asScala.nonEmpty &&
        idx.batchHeaders.asScala.forall(_ == "0"),
        s"batch header wrong: ${idx.batchHeaders.asScala.toSeq}")
      // every line is a self-contained JSON doc (the NDJSON frame)
      assert(idx.lines.asScala.forall(l =>
        l.startsWith("{") && l.endsWith("}")), "non-NDJSON frame")

      // at-least-once replay: re-posting the same docs adds lines but
      // no NEW ids — the index's uniqueKey upsert absorbs re-delivery
      val before = idx.ids
      SearchDocSink.postPartition(
        idx.lines.asScala.toSeq.distinct.iterator, idx.endpoint, 0L, 2)
      assert(idx.ids == before, "replay introduced new ids")
    } finally { q.stop(); idx.stop() }
  }

  test("a non-2xx index response fails the post loudly") {
    val idx = new StubIndex
    idx.failAll = true
    try {
      val e = intercept[IllegalArgumentException] {
        SearchDocSink.postPartition(
          Iterator("{\"id\":\"x\"}"), idx.endpoint, 1L, 10)
      }
      assert(e.getMessage.contains("503"), e.getMessage)
    } finally idx.stop()
  }
}
