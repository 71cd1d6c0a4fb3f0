package graft

import graft.sources.VersionedStore
import graft.streaming.VersionedCommitSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming version commits must behave exactly like batch commits:
  * each micro-batch is one O(delta) append version readable through
  * the SAME time-travel layout, a replayed batch id commits nothing
  * twice, and the batch-side services (manifest-diff IVM inputs,
  * vacuum retention) apply unchanged to a stream-built store. */
case class VcsReading(key: Long, amount: Long)

class VersionedCommitSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("each micro-batch commits one time-travel version; replay commits nothing") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_vcs_").toString
    val (path, ckpt) = (s"$base/store", s"$base/ckpt")
    val b1 = (1L to 40L).map(i => VcsReading(i, i * 100))
    val b2 = (41L to 60L).map(i => VcsReading(i, i * 100))

    val in = MemoryStream[VcsReading]
    val q = VersionedCommitSink.writeTo(in.toDF(), path, ckpt)
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    assert(VersionedCommitSink.committedVersions(spark, path) == Seq(1, 2))
    val v1 = VersionedStore.readVersion(spark, path, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val v2 = VersionedStore.readVersion(spark, path, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(v1 == b1.map(r => (r.key, r.amount)).sorted)
    assert(v2 == (b1 ++ b2).map(r => (r.key, r.amount)).sorted)
    // the commit was O(delta): v2 shares every v1 file
    val f1 = VersionedStore.versionFiles(spark, path, 1).toSet
    val f2 = VersionedStore.versionFiles(spark, path, 2).toSet
    assert(f1.subsetOf(f2) && (f2 -- f1).nonEmpty)

    // replay of an already-committed batch id: nothing commits
    assert(VersionedCommitSink.appendBatch(b1.toDF(), path, batchId = 0L).isEmpty)
    assert(VersionedCommitSink.committedVersions(spark, path) == Seq(1, 2))
    assert(VersionedStore.readVersion(spark, path, 2)
      .count() == (b1.size + b2.size).toLong, "replay changed the store")
    // an empty batch is a no-op, not an empty version
    assert(VersionedCommitSink.appendBatch(
      Seq.empty[VcsReading].toDF(), path, batchId = 9L).isEmpty)

    // the manifest diff feeds the q110 IVM machinery unchanged
    val delta = VersionedStore.deltaFiles(spark, path, 1, 2).toSet
    assert(delta == (f2 -- f1))
    val deltaRows = spark.read.parquet(delta.toSeq: _*)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(deltaRows == b2.map(r => (r.key, r.amount)).sorted)

    // batch-side retention applies to the stream-built store: keeping
    // only v2 deletes nothing (append-only — every v1 file is shared)
    // and v2 stays bit-stable
    // a crash-leftover manifest (written, txn never committed) must be
    // INVISIBLE to version resolution and retention: vacuum keeps the
    // newest COMMITTED version, never the orphan — else retention would
    // delete committed manifests and strand the stream (review finding)
    VersionedStore.writeManifest(spark, path, 9,
      VersionedStore.versionFiles(spark, path, 2).toSet)
    assert(VersionedStore.versions(spark, path) == Seq(1, 2),
      "uncommitted manifest leaked into the committed version set")

    val (expired, deleted) = VersionedStore.vacuum(spark, path, keepVersions = 1)
    assert(expired == 1 && deleted == 0)
    assert(VersionedStore.versions(spark, path) == Seq(2))
    assert(VersionedStore.readVersion(spark, path, 2)
      .agg(sum(col("amount"))).head().getLong(0) ==
      (b1 ++ b2).map(_.amount).sum)
  }
}
