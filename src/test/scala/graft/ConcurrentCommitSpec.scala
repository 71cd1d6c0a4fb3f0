package graft

import graft.sources.VersionedStore
import graft.streaming.{UpsertSink, VersionedCommitSink}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

/** Optimistic concurrency between DATA committers (round-12 verdict
  * order #6): the version-slot claim must make two uncoordinated
  * writers racing the same store resolve to DISTINCT slots — exactly
  * one wins each number, the loser settles onto the next — with no
  * manifest overwritten and no committed rows lost from the tip
  * lineage, and maintenance compaction must FAIL FAST instead of
  * committing over an in-flight data commit. */
class ConcurrentCommitSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def runRace(n: Int)(body: Int => Unit): Unit = {
    val pool = Executors.newFixedThreadPool(n)
    val start = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until n).foreach { i =>
      pool.execute { () =>
        start.await()
        try body(i) catch { case t: Throwable => errs.add(t) }
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "race pool timed out")
    if (!errs.isEmpty) throw errs.peek()
  }

  test("claimVersion grants each slot to exactly one of N concurrent claimers") {
    val path = Files.createTempDirectory("graft_claim_").toString + "/store"
    val won = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    runRace(8)(_ => won.add(VersionedStore.claimVersion(spark, path, 1)))
    val slots = won.toArray(Array.empty[Integer]).map(_.toInt).sorted.toSeq
    assert(slots == (1 to 8), s"slots granted more than once or skipped: $slots")
  }

  test("two concurrent append committers: distinct slots, tip carries BOTH batches") {
    val path = Files.createTempDirectory("graft_ccommit_").toString + "/store"
    // seed version 1 so both racers carry a parent forward
    VersionedCommitSink.appendBatch(
      Seq((0L, 0L)).toDF("key", "amount"), path, batchId = 0L)
    val committed = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    runRace(2) { i =>
      val rows = (1L to 10L).map(k => (i * 100L + k, k)).toDF("key", "amount")
      VersionedCommitSink.appendBatch(rows, path, batchId = i + 1L)
        .foreach(committed.add(_))
    }
    val vs = committed.toArray(Array.empty[Integer]).map(_.toInt).sorted.toSeq
    assert(vs == Seq(2, 3), s"racers did not land on distinct successive slots: $vs")
    // no lost update: the tip manifest lists both racers' rows (the
    // later committer settled on the earlier one's commit as parent)
    val tip = UpsertSink.readStore(spark, path)
      .select("key").as[Long].collect().toSet
    assert(tip == (Set(0L) ++ (1L to 10L) ++ (1L to 10L).map(_ + 100L)),
      "a racing append's rows were dropped from the tip lineage")
    // every committed manifest stayed intact (no overwrite): version v's
    // files are a superset of its parent's
    (1 to 2).foreach { v =>
      val p = VersionedStore.versionFiles(spark, path, v).toSet
      val c = VersionedStore.versionFiles(spark, path, v + 1).toSet
      assert(p.subsetOf(c), s"v${v + 1} lost v$v files — manifest orphaned")
    }
  }

  test("two concurrent COW upsert committers: loser retries, both batches land") {
    val path = Files.createTempDirectory("graft_cupsert_").toString + "/store"
    UpsertSink.upsertBatch(
      (1L to 20L).map(k => (k, 0L)).toDF("custkey", "v"), path, 0L, "custkey")
    runRace(2) { i =>
      val rows = (1L to 10L).map(k => (i * 10L + k, i + 1L)).toDF("custkey", "v")
      UpsertSink.upsertBatch(rows, path, batchId = i + 1L, keyCol = "custkey")
    }
    val fin = UpsertSink.readStore(spark, path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fin.keySet == (1L to 20L).toSet)
    assert((1L to 10L).forall(k => fin(k) == 1L), "writer 0's upserts lost")
    assert((11L to 20L).forall(k => fin(k) == 2L), "writer 1's upserts lost")
  }

  test("compaction fails fast over an in-flight data commit; vacuum reclaims burned slots") {
    val path = Files.createTempDirectory("graft_cfail_").toString + "/store"
    VersionedCommitSink.appendBatch(
      (1L to 30L).map(k => (k, k)).toDF("key", "amount"), path, batchId = 0L)
    // an in-flight writer holds the next slot (claimed, not yet committed)
    val held = VersionedStore.claimVersion(spark, path, 2)
    assert(held == 2)
    val e = intercept[IllegalArgumentException] {
      VersionedStore.compactCommit(spark, path, "key", targetFileBytes = 1L << 20)
    }
    assert(e.getMessage.contains("in flight"))
    assert(VersionedStore.versions(spark, path) == Seq(1),
      "failed compaction must commit nothing")
    // the holder of slot 2 crashed (never commits): later commits claim
    // past the abandoned slots (short settle — the abandoned holders are
    // timeout-resolved) and make slots 2-3 sub-tip; vacuum reclaims them
    VersionedCommitSink.appendBatch(
      Seq((31L, 31L)).toDF("key", "amount"), path, batchId = 1L,
      settleTimeoutMs = 500L)
    VersionedCommitSink.appendBatch(
      Seq((32L, 32L)).toDF("key", "amount"), path, batchId = 2L,
      settleTimeoutMs = 500L)
    VersionedStore.vacuum(spark, path, keepVersions = 10)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      VersionedStore.claimsDir(path) + "/v3")),
      "vacuum left the abandoned sub-tip claim behind")
    assert(UpsertSink.readStore(spark, path).count() == 32L)
  }
}
