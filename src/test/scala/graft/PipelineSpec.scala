package graft

import graft.sources.InvertedIndexStore
import graft.streaming.{IndexRefreshSink, Streams}
import graft.streaming.Streams.IncomingDoc
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end NRT curation pipeline — the reference's actual topology
  * (ingest → process → store → query, `NyTaxiYellowTripStreaming`'s
  * chain) composed from graft's own tiers in ONE streaming query:
  *
  *   quality gate (s12) → decontamination gate (s9) → segmented
  *   index refresh (s14) → BM25 point-query serving (q86b probe)
  *
  * Each tier is spec-tested alone; this proves they COMPOSE — the
  * stateless gates chain without breaking the unbounded-stream
  * contract, and the served index equals the batch pipeline (the same
  * gate functions applied to a static frame, then the one-shot index)
  * run over the same input. Zero train/serve skew end to end, because
  * every stage is the identical DataFrame transform in both modes. */
class PipelineSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val weights = Array(0.0, 10.0, 0.0, 0.0, -1.0)

  /** The composed curation chain — gates as written for streams, but
    * generic Dataset transforms, so the SAME function body serves the
    * batch twin below. */
  private def curate(in: Dataset[IncomingDoc],
      bloom: Array[Byte]): org.apache.spark.sql.DataFrame = {
    val accepted = Streams.qualityGate(in, weights)
      .filter(col("accepted"))
      .select(col("docId"), col("text"))
      .as[IncomingDoc]
    Streams.decontamGate(accepted, bloom)
      .filter(!col("flagged"))
      .select(col("docId").as("doc_id"), col("text"))
  }

  test("gates and index refresh compose into one query; serving equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val bloom = operators.Dedup.trainShingleBloom(spark, TestSpark.sf)
    val base = Files.createTempDirectory("graft_pipe_").toString
    val (path, ckpt) = (s"$base/index", s"$base/ckpt")

    // a verbatim train-corpus copy: passes quality, MUST be caught by
    // decontamination (pick a known-train doc, the s9 spec's recipe)
    val h = graft.functions.TextOps.polyHash61(
      concat(lit("split-salt-"), col("doc_id").cast("string")))
    val trainText = Tables.documents(spark, TestSpark.sf)
      .filter(pmod(h, lit(100L)) < 80)
      .select(col("text")).head.getString(0)
    val input = Seq(
      IncomingDoc(9001L,
        "the spark query is on the mat and the hash of the table is in the house"),
      IncomingDoc(9002L,
        "a spark hash is a value and the query of a row is a key in the store"),
      IncomingDoc(9003L, "zzz qqq xxx yyy www vvv uuu"), // quality-rejected
      IncomingDoc(9004L, trainText))                     // contamination-flagged

    val in = MemoryStream[IncomingDoc]
    val q = IndexRefreshSink.writeTo(curate(in.toDS(), bloom), path, ckpt)
    try {
      // two micro-batches: the serving tier must reflect each as it lands
      in.addData(input(0), input(2))
      q.processAllAvailable()
      in.addData(input(1), input(3))
      q.processAllAvailable()

      val served = IndexRefreshSink.probe(spark, path).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

      // batch twin: the SAME curate() over a static frame, one-shot index
      val survivors = curate(input.toDS(), bloom)
      val expected = graft.operators.Text.bm25Score(
        InvertedIndexStore.postings(survivors)
          .filter(col("term").isin(graft.operators.Text.Bm25Query: _*))
          .select(col("doc_id"), col("dl"), col("term"), col("tf")),
        InvertedIndexStore.statsAgg(survivors))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

      assert(served.sameElements(expected),
        s"composed stream serves ${served.mkString("|")}, batch twin ${expected.mkString("|")}")
      // the pipeline's judgments: both clean docs served, the
      // quality-reject and the contaminated copy absent
      val ids = served.map(_._1).toSet
      assert(ids == Set(9001L, 9002L), s"wrong surviving set: $ids")
      // composition preserved statelessness up to the index sink: the
      // only stateful machinery is foreachBatch's own bookkeeping
      assert(q.lastProgress.stateOperators.isEmpty,
        "gate composition registered streaming state")

      // maintenance step: OPTIMIZE the accumulated micro-batch segments
      // while the pipeline is live — serving is bit-identical across
      // merge and vacuum, and the live set collapses to one segment
      assert(IndexRefreshSink.mergeSegments(spark, path).nonEmpty,
        "merge found nothing to fold")
      IndexRefreshSink.vacuum(spark, path)
      val afterMerge = IndexRefreshSink.probe(spark, path).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(afterMerge.sameElements(expected),
        "segment merge changed the served scores")
      assert(IndexRefreshSink.liveSegments(spark, path).size == 1)
    } finally q.stop()
  }
}
