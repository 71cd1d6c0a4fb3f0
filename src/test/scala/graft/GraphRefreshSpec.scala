package graft

import graft.sources.{IndexTombstones, KnnGraphStore}
import graft.streaming.GraphRefreshSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The streamed kNN-graph store's contract (round-15 verdict #4):
  * vectors are servable the micro-batch they arrive (exact fresh
  * tier), the rebuild trigger folds the delta into a graph that is
  * BIT-IDENTICAL to a batch build over the same corpus, replay is
  * idempotent across merges, purge excludes through both tiers and
  * goes physical at the rebuild, and superseded graphs vacuum away. */
class GraphRefreshSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val n = 200
  private def vec(i: Long): Seq[Double] = {
    val th = 2 * math.Pi * i / n
    Seq(math.cos(th), math.sin(th))
  }
  private val qth = 2 * math.Pi * 0.37
  private val qe = Array(math.cos(qth), math.sin(qth))

  private def brute(ids: Seq[Long], dead: Set[Long], k: Int): Seq[Long] =
    ids.filterNot(dead).map { i =>
      val e = vec(i)
      val cos = e.zip(qe.toSeq).map(t => t._1 * t._2).sum /
        math.sqrt(e.map(x => x * x).sum)
      (i, cos)
    }.sortBy(t => (-t._2, t._1)).take(k).map(_._1)

  // the driver-exact scorer for walk-parity comparisons
  private val exactScorer: Seq[Long] => Seq[(Long, Double)] =
    ids => ids.map { i =>
      val e = vec(i)
      (i, e.zip(qe.toSeq).map(t => t._1 * t._2).sum /
        math.sqrt(e.map(x => x * x).sum))
    }

  test("stream: fresh vectors serve immediately; the rebuild is " +
      "bit-identical to a batch build; replay, purge and vacuum hold") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_graphr_").toString
    val (path, ckpt) = (s"$base/gvecs", s"$base/ckpt")
    val b1 = (1L to 120L).map(i => (i, vec(i)))
    val b2 = (121L to 200L).map(i => (i, vec(i)))

    val in = MemoryStream[(Long, Seq[Double])]
    val q = GraphRefreshSink.writeTo(in.toDF().toDF("vec_id", "e"), path, ckpt)
    try {
      in.addData(b1: _*)
      q.processAllAvailable()
      // NRT: no graph yet — the fresh exact tier serves batch 1 alone
      assert(GraphRefreshSink.currentGraph(spark, path).isEmpty)
      val got1 = GraphRefreshSink.probe(spark, path, qe, k = 10)
      assert(got1.map(_._1) == brute(b1.map(_._1), Set.empty, 10),
        s"fresh tier != exact scan after batch 1: $got1")

      // rebuild trigger: covers batch 1
      assert(GraphRefreshSink.maybeRebuild(spark, path).contains(0L))
      val (hi1, g1) = GraphRefreshSink.currentGraph(spark, path).get
      assert(hi1 == 0L)
      // bit parity with a batch build over the same corpus: identical
      // walk results AND hop counts under the same scorer
      val batchPath = s"$base/batch_g"
      KnnGraphStore.buildFromVectors(spark,
        b1.toDF("vec_id", "e").withColumn("n2",
          org.apache.spark.sql.functions.expr(
            "aggregate(transform(e, x -> x * x), 0.0d, (a, x) -> a + x)")),
        batchPath, targetFileBytes = 16L << 10)
      val streamWalk = KnnGraphStore.probeFlat(spark, g1, exactScorer,
        10, 8, 96, 48)
      val batchWalk = KnnGraphStore.probeFlat(spark, batchPath, exactScorer,
        10, 8, 96, 48)
      assert(streamWalk == batchWalk,
        "stream-rebuilt graph walk != batch-built graph walk")

      // batch 2 lands: served immediately through the fresh tier while
      // the graph still covers only batch 1
      in.addData(b2: _*)
      q.processAllAvailable()
      val got2 = GraphRefreshSink.probe(spark, path, qe, k = 10)
      assert(got2.map(_._1) == brute((b1 ++ b2).map(_._1), Set.empty, 10),
        s"merged probe != exact scan after batch 2: $got2")

      // replay of a committed batch id is idempotent
      GraphRefreshSink.appendBatch(b1.toDF("vec_id", "e"), path, 0L)
      assert(GraphRefreshSink.probe(spark, path, qe, k = 10) == got2)

      // purge the current top-1: both tiers exclude it immediately
      val top = got2.head._1
      GraphRefreshSink.purge(spark, path, Seq(top))
      val got3 = GraphRefreshSink.probe(spark, path, qe, k = 10)
      assert(got3.map(_._1) == brute((b1 ++ b2).map(_._1), Set(top), 10),
        s"post-purge probe served the purged node: $got3")

      // the delta (80 of 120) passes the trigger: rebuild covers all,
      // folds the tombstone physically, clears it
      assert(GraphRefreshSink.maybeRebuild(spark, path).contains(1L))
      assert(!IndexTombstones.exists(spark, path))
      val (_, g2) = GraphRefreshSink.currentGraph(spark, path).get
      assert(spark.read.parquet(g2)
        .filter(org.apache.spark.sql.functions.col("src") === top ||
          org.apache.spark.sql.functions.col("dst") === top).count() == 0,
        "purged node recoverable from the rebuilt graph")
      val got4 = GraphRefreshSink.probe(spark, path, qe, k = 10)
      assert(got4.map(_._1).toSet.intersect(Set(top)).isEmpty)
      // post-rebuild the probe IS the walk (no fresh segments left
      // uncovered): ids match the exact scan's at walk recall
      assert(got4.map(_._1).forall(id =>
        brute((b1 ++ b2).map(_._1), Set(top), 20).contains(id)))

      // superseded graph generations vacuum away; serving unchanged
      GraphRefreshSink.vacuumGraphs(spark, path)
      val f = graft.streaming.Segments.fs(spark, path)
      assert(!f.exists(new org.apache.hadoop.fs.Path(g1)))
      assert(GraphRefreshSink.probe(spark, path, qe, k = 10) == got4)

      // segment merge keeps the covered/fresh split exact
      assert(GraphRefreshSink.mergeSegments(spark, path).nonEmpty)
      GraphRefreshSink.vacuum(spark, path)
      assert(GraphRefreshSink.probe(spark, path, qe, k = 10) == got4)
      // a replayed batch id inside the merged range is skipped
      GraphRefreshSink.appendBatch(b1.toDF("vec_id", "e"), path, 0L)
      assert(GraphRefreshSink.liveSegments(spark, path).size == 1)
    } finally q.stop()
  }
}
