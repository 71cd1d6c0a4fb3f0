package graft

import graft.sources.VersionedStore
import graft.streaming.{PurgeSink, UpsertSink}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** s20: the streaming erasure executor must turn each micro-batch of
  * request keys into one bounded COW delete commit — purged keys leave
  * the tip immediately, untouched files are shared, history stays
  * auditable until retention, and a replayed batch commits NOTHING
  * (already-absent keys own no file). */
class PurgeSinkSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** A txn-lineage store (the upsert-sink layout), 4 range files. */
  private def buildStore(): String = {
    val path = Files.createTempDirectory("graft_psink_").toString + "/store"
    UpsertSink.upsertBatch((1L to 400L).map(k => (k, k * 3))
      .toDF("key", "amount"), path, batchId = 0L, keyCol = "key",
      initialPartitions = 4)
    path
  }

  test("each erasure micro-batch commits one bounded delete; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val path = buildStore()
    val ckpt = Files.createTempDirectory("graft_psink_ck_").toString
    val in = MemoryStream[Long]
    val q = PurgeSink.writeTo(in.toDF().withColumnRenamed("value", "key"),
      path, "key", ckpt)
    try {
      in.addData(10L, 20L, 30L); q.processAllAvailable()
      val tip1 = VersionedStore.versions(spark, path).last
      assert(tip1 == 2)
      assert(VersionedStore.readVersion(spark, path, tip1)
        .filter(col("key").isin(10L, 20L, 30L)).count() == 0L)
      // bounded: keys 10-30 live in ONE of the four range files
      val f1 = VersionedStore.versionFiles(spark, path, 1).toSet
      val f2 = VersionedStore.versionFiles(spark, path, 2).toSet
      assert((f1 -- f2).size == 1, "delete rewrote more than the owning file")

      in.addData(150L, 350L); q.processAllAvailable()
      val tip2 = VersionedStore.versions(spark, path).last
      assert(tip2 == 3)
      assert(VersionedStore.readVersion(spark, path, tip2).count() == 395L)
      // history: v1 still holds every purged row until retention
      assert(VersionedStore.readVersion(spark, path, 1).count() == 400L)
    } finally q.stop()

    // replay: re-executing an already-applied batch commits NOTHING —
    // the keys are absent, no band owns them, deleteCommit no-ops
    assert(PurgeSink.purgeBatch(Seq(10L, 20L, 30L).toDF("key"),
      path, "key").isEmpty)
    assert(VersionedStore.versions(spark, path) == Seq(1, 2, 3))

    // retention makes it physical, and an upsert writer can continue
    // on the purged store afterwards
    VersionedStore.vacuum(spark, path, keepVersions = 1)
    val remaining = VersionedStore.readVersion(spark, path,
      VersionedStore.versions(spark, path).last)
    assert(remaining.count() == 395L)
    UpsertSink.upsertBatch(Seq((10L, 999L)).toDF("key", "amount"),
      path, batchId = 1L, keyCol = "key")
    val fin = UpsertSink.readStore(spark, path)
    assert(fin.count() == 396L)
    assert(fin.filter(col("key") === 10L).head().getLong(1) == 999L)
  }
}
