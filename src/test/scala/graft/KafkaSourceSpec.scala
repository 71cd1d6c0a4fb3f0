package graft

import graft.streaming.{KafkaSource, Streams}
import graft.streaming.KafkaSource.KafkaSourceOptions
import graft.streaming.Streams.EntityUpdate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** The Kafka builder's option mapping and its value→typed-record parse
  * path, driven file-free through MemoryStream (no connector jar or
  * broker ships in this container; `raw` only assembles public reader
  * options, which is what the options test pins). */
class KafkaSourceSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("options map carries brokers, subscription, offsets, rate cap") {
    val opts = KafkaSourceOptions(
      bootstrapServers = "broker1:9092,broker2:9092",
      topics = Seq("orders", "orders_replay"),
      startingOffsets = "earliest",
      maxOffsetsPerTrigger = Some(50000L),
      failOnDataLoss = false,
      extra = Map("kafka.security.protocol" -> "SASL_SSL"))
    val m = opts.asMap
    assert(m("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(m("subscribe") == "orders,orders_replay")
    assert(m("startingOffsets") == "earliest")
    assert(m("maxOffsetsPerTrigger") == "50000")
    assert(m("failOnDataLoss") == "false")
    assert(m("kafka.security.protocol") == "SASL_SSL")
    // defaults: no rate cap key unless set
    assert(!KafkaSourceOptions("b:9092", Seq("t")).asMap.contains("maxOffsetsPerTrigger"))
  }

  test("publisher frame drops header/short lines and keys by portable hash") {
    import graft.streaming.KafkaPublisher
    val lines = Seq(
      "o_orderkey,o_custkey,o_orderstatus,o_totalprice",  // header -> drop
      "short",                                            // < 10 chars -> drop
      "1,101,O,10.50,1-URGENT",
      "2,102,F,7.25,3-MEDIUM").toDS()
    val out = KafkaPublisher.frame(lines, headerPrefix = "o_orderkey")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.length == 2)
    assert(out.map(_._2).toSet ==
      Set("1,101,O,10.50,1-URGENT", "2,102,F,7.25,3-MEDIUM"))
    // key = portable hash of the value, as a string (stable partitioning)
    val expectedKey = spark.sql(
      "SELECT CAST(" +
        "aggregate(split('1,101,O,10.50,1-URGENT', ''), 0L, (a, c) -> (a * 31 + ascii(c)) % 1000000007) + " +
        "shiftleft(aggregate(split('1,101,O,10.50,1-URGENT', ''), 0L, (a, c) -> (a * 37 + ascii(c)) % 1000000007), 31) AS STRING)")
      .collect()(0).getString(0)
    assert(out.toMap.map(_.swap).apply("1,101,O,10.50,1-URGENT") == expectedKey)
    // streaming-compat: the same frame runs as a stream (memory sink)
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val sink = "kafka_pub_sink"
    val q = KafkaPublisher.frame(in.toDS(), "o_orderkey")
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData("o_orderkey,skip-me", "3,103,O,5.00,2-HIGH")
      q.processAllAvailable()
      assert(spark.table(sink).collect().map(_.getString(1)).toSeq ==
        Seq("3,103,O,5.00,2-HIGH"))
    } finally q.stop()
  }

  test("observed ingest parse reports exact quality counters on one pass") {
    val lines = Seq(
      "o_orderkey,o_custkey,o_orderstatus,o_totalprice",  // header -> dropped
      "short",                                            // dropped
      "1,101,O,10.50,1-URGENT",
      "2,102,,7.25,3-MEDIUM",                             // defaulted status
      "3,103,F,1.00,2-HIGH").toDS().toDF("line")
    val (parsed, obs) = graft.operators.Ingest.observedCsvParse(lines, "o_orderkey")
    val out = parsed.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, "O"), (2L, "0"), (3L, "F")))
    val m = obs.get
    assert(m("rows_in") == 5L && m("rows_kept") == 3L &&
      m("rows_dropped") == 2L && m("fields_defaulted") == 1L, m.toString)
  }

  test("publish options map carries topic, acks, linger and batch size") {
    import graft.streaming.KafkaPublisher.KafkaPublishOptions
    val m = KafkaPublishOptions("b1:9092", "orders", acks = "1",
      lingerMs = 5L, batchSize = 65536L,
      extra = Map("kafka.compression.type" -> "lz4")).asMap
    assert(m("kafka.bootstrap.servers") == "b1:9092")
    assert(m("topic") == "orders")
    assert(m("kafka.acks") == "1")
    assert(m("kafka.linger.ms") == "5")
    assert(m("kafka.batch.size") == "65536")
    assert(m("kafka.compression.type") == "lz4")
  }

  test("orderEvents parse: header/short/poison lines drop, empty status defaults") {
    val lines = Seq(
      "o_orderkey,o_custkey,o_orderstatus,o_totalprice,o_orderpriority", // header
      "BAD",                                  // short line
      "1,101,O,10.50,1-URGENT",               // clean
      "2,102,,7.25,3-MEDIUM",                 // empty status -> "0"
      "3,xxx,F,1.00,2-HIGH",                  // unparseable custkey -> poison, skip
      "4,104,F,abc,2-HIGH",                   // unparseable amount -> poison, skip
      "corrupted-payload-no-commas-here",     // long line, 1 field -> skip
      "5,105,LONG-STATUS")                    // long line, only 3 fields -> skip
      .toDS()
    val out = KafkaSource.orderEvents(lines).collect().sortBy(_.custkey)
    assert(out.length == 2)
    assert(out(0) == Streams.OrderEvent(101L, 10.50, "O"))
    assert(out(1) == Streams.OrderEvent(102L, 7.25, "0"))
  }

  test("REAL BROKER (guarded): raw kafka source end-to-end when GRAFT_KAFKA_BROKERS is set") {
    // The first thing a real deployment wires is raw() against a live
    // broker — this path makes that wire-up TESTED code instead of a
    // seam. Doubly guarded because this container ships neither the
    // spark-sql-kafka connector jar nor a broker: `assume` CANCELS
    // (not fails) the test unless both are present, so CI stays green
    // here and a cluster operator runs
    //   GRAFT_KAFKA_BROKERS=host:9092 GRAFT_KAFKA_TOPIC=t sbt test
    // to exercise the identical builder + parse the MemoryStream specs
    // gate.
    val brokers = sys.env.get("GRAFT_KAFKA_BROKERS")
    assume(brokers.nonEmpty,
      "GRAFT_KAFKA_BROKERS not set - real-broker path skipped")
    val connectorPresent =
      try {
        Class.forName(
          "org.apache.spark.sql.kafka010.KafkaSourceProvider",
          false, getClass.getClassLoader)
        true
      } catch { case _: ClassNotFoundException => false }
    assume(connectorPresent,
      "spark-sql-kafka connector not on classpath - real-broker path skipped")
    val topic = sys.env.getOrElse("GRAFT_KAFKA_TOPIC", "graft_orders_smoke")
    val raw = KafkaSource.raw(spark, KafkaSourceOptions(
      bootstrapServers = brokers.get,
      topics = Seq(topic),
      startingOffsets = "earliest",
      maxOffsetsPerTrigger = Some(10000L),
      failOnDataLoss = false))
    val sink = "kafka_real_sink"
    val q = Streams.entityStream(KafkaSource.orderEvents(KafkaSource.lines(raw)))
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      // contract, not content: the stream starts, reads whatever the
      // operator staged on the topic, and the typed parse holds
      assert(q.isActive || q.exception.isEmpty,
        s"real-broker query failed: ${q.exception}")
      spark.table(sink).as[EntityUpdate].collect().foreach { u =>
        assert(u.totalTrips >= 1 && (u.state == "New" || u.state == "Modified"))
      }
    } finally q.stop()
  }

  test("parse path composes with entityStream end-to-end over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val sink = "kafka_entity_sink"
    val q = Streams.entityStream(KafkaSource.orderEvents(in.toDS()))
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData("1,101,O,10.00,1-URGENT", "BAD", "1,101,F,5.00,1-URGENT")
      q.processAllAvailable()
      val u = spark.table(sink).as[EntityUpdate].collect()
        .find(_.custkey == 101L).get
      assert(u.state == "New" && u.totalTrips == 2 && u.totalAmount == 15.0)
      assert(u.openTrips == 1 && u.fulfilledTrips == 1)
    } finally q.stop()
  }
}
