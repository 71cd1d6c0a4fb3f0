package graft

import graft.streaming.AnnRefreshSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The streamed vector index's contract — the AnnIndexStore serving
  * laws held on segments that arrived through a stream:
  *
  *  - probing ALL cells over the streamed segments equals the exact
  *    brute-force scan of everything streamed so far (the nprobe = k
  *    law, here doubling as stream≡batch parity: cell membership is a
  *    pure function of the stable centroids, so segment layout is
  *    invisible);
  *  - replay of a committed batch id is idempotent, including AFTER a
  *    merge folded it;
  *  - merge + vacuum leave serving bit-identical with fewer live
  *    files;
  *  - the probe opens only manifest-selected files.
  */
class AnnRefreshSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def corpus = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    .limit(300)

  /** Exact cosine top-k of `rows` against `qe`, computed in plain
    * Scala — the oracle no Spark machinery touches. */
  private def bruteTopK(rows: Seq[(Long, Seq[Double])], qe: Array[Double],
      k: Int): Seq[(Long, Double)] = {
    val qn = math.sqrt(qe.map(x => x * x).sum)
    rows.map { case (id, e) =>
      val d = e.zip(qe).map { case (a, b) => a * b }.sum
      val n = math.sqrt(e.map(x => x * x).sum)
      (id, d / (n * qn))
    }.sortBy { case (id, c) => (-c, id) }.take(k)
  }

  test("streamed segments serve the exact scan at nprobe = cells; replay + merge safe") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_annr_").toString
    val (path, ckpt) = (s"$base/index", s"$base/ckpt")
    val all = corpus.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val qe = all.find(_._1 == 0L).get._2.toArray
    val stream = all.filterNot(_._1 == 0L)
    val (b1, b2) = stream.partition(_._1 % 2 == 0)
    // stable coarse quantizer: trained once on the first batch's frame
    // (the offline-retrain contract — assignment-only afterwards)
    val cents = graft.ml.KMeans.fit(
      b1.toSeq.toDF("vec_id", "e"), k = 8, iters = 3)

    val in = MemoryStream[(Long, Seq[Double])]
    val q = AnnRefreshSink.writeTo(
      in.toDF().toDF("vec_id", "e"), path, cents, ckpt)
    try {
      in.addData(b1.toSeq: _*)
      q.processAllAvailable()
      // NRT contract: batch-1 vectors already served, exactly
      val got1 = AnnRefreshSink.probe(spark, path, cents, qe,
        nprobe = cents.length, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      val exp1 = bruteTopK(b1.toSeq, qe, 10)
      assert(got1.map(_._1) == exp1.map(_._1) &&
        got1.zip(exp1).forall { case ((_, a), (_, b)) => math.abs(a - b) < 1e-12 },
        s"streamed probe != exact scan after batch 1:\n$got1\n$exp1")

      in.addData(b2.toSeq: _*)
      q.processAllAvailable()
      val gotAll = AnnRefreshSink.probe(spark, path, cents, qe,
        nprobe = cents.length, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      val expAll = bruteTopK(stream.toSeq, qe, 10)
      assert(gotAll.map(_._1) == expAll.map(_._1),
        s"streamed probe != exact scan after batch 2")

      // nprobe = 1 only serves from one cell — a strict subset read
      val one = AnnRefreshSink.probe(spark, path, cents, qe, 1, 10).collect()
      assert(one.nonEmpty && one.map(_.getLong(1)).toSet.size == 1)

      // replay idempotence (pre-merge): Overwrite reproduces batch 0
      AnnRefreshSink.appendBatch(
        b1.toSeq.toDF("vec_id", "e"), path, batchId = 0L, cents)
      val replay = AnnRefreshSink.probe(spark, path, cents, qe,
        cents.length, 10).collect().map(_.getLong(0)).toSeq
      assert(replay == gotAll.map(_._1), "replay changed the index")

      // merge + vacuum: serving bit-identical, live files reduced,
      // folded batch ids skip on replay
      def liveFiles(): Long = AnnRefreshSink.liveSegments(spark, path).map { sg =>
        Option(new java.io.File(s"$path/${sg.name}").listFiles()).toSeq
          .flatten.count(_.getName.endsWith(".parquet")).toLong
      }.sum
      val before = liveFiles()
      assert(AnnRefreshSink.mergeSegments(spark, path).nonEmpty)
      AnnRefreshSink.vacuum(spark, path)
      assert(AnnRefreshSink.liveSegments(spark, path).size == 1)
      assert(liveFiles() < before, "merge did not reduce live files")
      AnnRefreshSink.appendBatch(
        b1.toSeq.toDF("vec_id", "e"), path, batchId = 0L, cents)
      assert(!new java.io.File(s"$path/seg_0").exists,
        "replayed folded batch re-created its base segment")
      val afterMerge = AnnRefreshSink.probe(spark, path, cents, qe,
        cents.length, 10).collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      assert(afterMerge == gotAll, "merge/vacuum/replay changed serving")
    } finally q.stop()
  }

  test("probe opens only manifest-selected cell files across segments") {
    val base = Files.createTempDirectory("graft_annr_prune_").toString
    val path = s"$base/index"
    val all = corpus.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val qe = all.find(_._1 == 0L).get._2.toArray
    val cents = graft.ml.KMeans.fit(
      all.toSeq.toDF("vec_id", "e"), k = 8, iters = 3)
    all.grouped(50).zipWithIndex.foreach { case (g, i) =>
      AnnRefreshSink.appendBatch(
        g.toSeq.toDF("vec_id", "e"), path, i.toLong, cents, segFiles = 8)
    }
    val live = AnnRefreshSink.liveSegments(spark, path)
    val m = spark.read.parquet(live.map(sg =>
      s"${AnnRefreshSink.manifestPath(path)}/${sg.name}"): _*)
    val total = m.count()
    val probe = AnnRefreshSink.probe(spark, path, cents, qe, 1, 10)
    probe.collect()
    val scan = probe.queryExecution.executedPlan.collectFirst {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
    }.getOrElse(fail("no FileSourceScanExec"))
    assert(scan.metrics("numFiles").value < total,
      s"probe opened ${scan.metrics("numFiles").value} of $total segment files")
    // a 1-element isin folds to EqualTo; either way the cell predicate
    // must reach the parquet reader
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("In(cell") || pushed.contains("EqualTo(cell"),
      s"cell filter not pushed: $pushed")
  }
}
