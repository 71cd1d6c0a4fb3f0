package graft

import graft.sources.InvertedIndexStore
import graft.streaming.IndexRefreshSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The streamed segmented index must serve bit-identically to a batch
  * rebuild over the same corpus, stay idempotent under batch replay,
  * and keep the probe's read bounded by the query terms' files — the
  * NRT ingest→index→query loop closed with the batch tier as oracle. */
class IndexRefreshSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def docs(dir: String) = Tables.documents(spark, dir)
    .select(col("doc_id"), col("text"))

  /** Batch-tier expected scores over `corpus`: the same shared postings
    * + Okapi arithmetic, computed in one shot (no segments). */
  private def expected(corpus: org.apache.spark.sql.DataFrame) =
    graft.operators.Text.bm25Score(
      InvertedIndexStore.postings(corpus)
        .filter(col("term").isin(graft.operators.Text.Bm25Query: _*))
        .select(col("doc_id"), col("dl"), col("term"), col("tf")),
      InvertedIndexStore.statsAgg(corpus))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  test("streamed segments serve scores identical to a batch rebuild; replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_ixr_").toString
    val (path, ckpt) = (s"$base/index", s"$base/ckpt")
    val all = docs("/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = all.partition(_._1 % 2 == 0)

    val in = MemoryStream[(Long, String)]
    val q = IndexRefreshSink.writeTo(
      in.toDF().toDF("doc_id", "text"), path, ckpt)
    try {
      in.addData(b1.toSeq: _*)
      q.processAllAvailable()
      // NRT contract: the probe already serves batch-1 docs, exactly
      val afterB1 = IndexRefreshSink.probe(spark, path).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val expB1 = expected(b1.toSeq.toDF("doc_id", "text"))
      assert(afterB1.sameElements(expB1),
        s"segment serving != batch tier after batch 1")

      in.addData(b2.toSeq: _*)
      q.processAllAvailable()
      val afterB2 = IndexRefreshSink.probe(spark, path).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val expAll = expected(all.toSeq.toDF("doc_id", "text"))
      assert(afterB2.sameElements(expAll),
        s"segment serving != batch tier after batch 2")

      // replay idempotence: re-indexing an already-committed batch id
      // (the foreachBatch retry case) must not duplicate postings
      IndexRefreshSink.appendBatch(
        b1.toSeq.toDF("doc_id", "text"), path, batchId = 0L)
      val replayed = IndexRefreshSink.probe(spark, path).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(replayed.sameElements(expAll), "batch replay changed the index")

      // an empty micro-batch is a no-op, not a part-file-less segment
      // dir that would break the manifest read
      IndexRefreshSink.appendBatch(
        Seq.empty[(Long, String)].toDF("doc_id", "text"), path, batchId = 99L)
      assert(!new java.io.File(s"$path/${IndexRefreshSink.segName(99L)}").exists,
        "empty batch landed a segment directory")
      val afterEmpty = IndexRefreshSink.probe(spark, path).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(afterEmpty.sameElements(expAll), "empty batch changed the index")
    } finally q.stop()
  }

  test("probe reads only the query terms' posting files across segments") {
    // many small segments (4 docs per batch) => many posting files; the
    // manifest must keep the probe's file list a strict subset
    val base = Files.createTempDirectory("graft_ixr_prune_").toString
    val path = s"$base/index"
    val all = docs("/root/testdata/sf0.001").limit(40).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    all.grouped(4).zipWithIndex.foreach { case (g, i) =>
      IndexRefreshSink.appendBatch(
        g.toSeq.toDF("doc_id", "text"), path, batchId = i.toLong)
    }
    val m = spark.read.option("recursiveFileLookup", "true")
      .parquet(InvertedIndexStore.manifestPath(path))
    val total = m.count()
    val selected = InvertedIndexStore.filesFor(
      m, graft.operators.Text.Bm25Query)
    assert(selected.nonEmpty && selected.length < total,
      s"manifest pruned nothing: ${selected.length} of $total")
    // and the pruned read still yields the exact batch-tier answer
    val got = IndexRefreshSink.probe(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exp = expected(all.toSeq.toDF("doc_id", "text"))
    assert(got.sameElements(exp))
  }
}
