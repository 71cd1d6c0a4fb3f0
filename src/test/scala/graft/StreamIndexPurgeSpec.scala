package graft

import graft.sources.{IndexTombstones, InvertedIndexStore}
import graft.streaming.{AnnRefreshSink, IndexRefreshSink}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Erasure on the STREAMED serving stores (round-15 verdict #1's
  * "extend s14/s17 replay safety" clause): a purge lands mid-stream
  * and both probes exclude the subjects immediately with exact stats
  * adjustment (bit parity with a batch store over the survivors); the
  * segment MERGE is the fold point — tombstoned rows drop physically,
  * tombstones clear after its commit, and replays (of batches and of
  * the purge itself) stay idempotent across it. */
class StreamIndexPurgeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def docText(i: Long): String =
    (Seq.fill((i % 5 + 1).toInt)("spark") ++
      Seq.fill((i % 3).toInt)("query") ++
      Seq.fill((i % 7 % 3).toInt)("hash") ++
      Seq.fill((i % 4 + 2).toInt)(s"filler$i")).mkString(" ")

  private def bm25Rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("s14 lexical: mid-stream purge is survivor-exact, merge folds " +
      "it physical, replays stay idempotent") {
    val path = Files.createTempDirectory("graft_s14purge_").toString + "/ix"
    val b1 = (1L to 40L).map(i => (i, docText(i))).toDF("doc_id", "text")
    val b2 = (41L to 80L).map(i => (i, docText(i))).toDF("doc_id", "text")
    IndexRefreshSink.appendBatch(b1, path, 0L)
    IndexRefreshSink.appendBatch(b2, path, 1L)
    val purged = Seq(7L, 17L, 47L, 77L)
    IndexRefreshSink.purge(spark, path, purged)
    val got = bm25Rows(IndexRefreshSink.probe(spark, path))
    assert(got.nonEmpty && got.forall(t => !purged.contains(t._1)))
    // bit parity: a BATCH index over the surviving corpus probes the
    // same bits (stats adjustment is exact on segments too)
    val batchPath = Files.createTempDirectory("graft_s14purge_b_")
      .toString + "/ix"
    InvertedIndexStore.build(
      (1L to 80L).filterNot(purged.contains).map(i => (i, docText(i)))
        .toDF("doc_id", "text"), batchPath, files = 8)
    assert(got == bm25Rows(InvertedIndexStore.bm25Probe(spark, batchPath)),
      "streamed purged probe != batch survivor rebuild")
    // the phrase tier excludes too
    assert(IndexRefreshSink.phraseProbe(spark, path)
      .filter(col("doc_id").isin(purged: _*)).count() == 0)
    // replayed purge: no double-subtract
    IndexRefreshSink.purge(spark, path, purged)
    assert(bm25Rows(IndexRefreshSink.probe(spark, path)) == got)
    // MERGE = the fold point: physical drop, tombstones cleared,
    // serving unchanged
    assert(IndexRefreshSink.mergeSegments(spark, path).nonEmpty)
    assert(!IndexTombstones.exists(spark, path))
    assert(bm25Rows(IndexRefreshSink.probe(spark, path)) == got)
    IndexRefreshSink.vacuum(spark, path)
    val seg = IndexRefreshSink.liveSegments(spark, path)
    assert(seg.size == 1 && seg.head.merged)
    assert(spark.read.parquet(s"$path/${seg.head.name}")
      .filter(col("doc_id").isin(purged: _*)).count() == 0,
      "purged doc recoverable from the merged segment")
    // post-merge: a replayed purge resolves nothing (docs are gone)
    IndexRefreshSink.purge(spark, path, purged)
    assert(!IndexTombstones.exists(spark, path))
    // and a replayed batch id inside the merged range is skipped
    IndexRefreshSink.appendBatch(b1, path, 0L)
    assert(IndexRefreshSink.liveSegments(spark, path).size == 1)
    assert(bm25Rows(IndexRefreshSink.probe(spark, path)) == got)
  }

  test("s17 vector: mid-stream purge excludes from the probe, merge " +
      "folds it physical") {
    val path = Files.createTempDirectory("graft_s17purge_").toString + "/vx"
    def vec(i: Long) = Seq(math.sin(i * 1.3), math.cos(i * 0.7),
      math.sin(i * 2.1 + 1))
    val all = (1L to 60L).map(i => (i, vec(i)))
    val cents = graft.ml.KMeans.fit(
      all.toDF("vec_id", "e"), k = 4, iters = 3)
    val (b1, b2) = all.partition(_._1 <= 30L)
    AnnRefreshSink.appendBatch(b1.toDF("vec_id", "e"), path, 0L, cents)
    AnnRefreshSink.appendBatch(b2.toDF("vec_id", "e"), path, 1L, cents)
    val qe = vec(1L).toArray
    def probeIds() = AnnRefreshSink.probe(spark, path, cents, qe,
      nprobe = cents.length, k = 10)
      .select("vec_id").as[Long].collect().toSeq
    val top = probeIds().take(3)
    AnnRefreshSink.purge(spark, path, top)
    val got = probeIds()
    assert(got.nonEmpty && got.forall(v => !top.contains(v)))
    // nprobe = cells over the purged store == brute over survivors
    val brute = all.filterNot(t => top.contains(t._1)).map { case (i, e) =>
      val qn = math.sqrt(qe.map(x => x * x).sum)
      (i, e.zip(qe.toSeq).map(t => t._1 * t._2).sum /
        (math.sqrt(e.map(x => x * x).sum) * qn))
    }.sortBy(t => (-t._2, t._1)).take(10).map(_._1)
    assert(got == brute, s"purged streamed probe $got != survivor brute $brute")
    assert(AnnRefreshSink.mergeSegments(spark, path).nonEmpty)
    assert(!IndexTombstones.exists(spark, path))
    assert(probeIds() == got)
    AnnRefreshSink.vacuum(spark, path)
    val seg = AnnRefreshSink.liveSegments(spark, path)
    assert(seg.size == 1 && seg.head.merged)
    assert(spark.read.parquet(s"$path/${seg.head.name}")
      .filter(col("vec_id").isin(top: _*)).count() == 0,
      "purged vector recoverable from the merged segment")
  }
}
