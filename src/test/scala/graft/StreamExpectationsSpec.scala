package graft

import graft.sources.{Expectations, VersionedStore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** s23_guarded_upsert: expectations on the streaming upsert path —
  * per-batch split, batch-keyed Overwrite quarantine (the s15
  * changelog replay discipline), all-reject batches recorded with no
  * version committed, explicit quarantine retention. */
class StreamExpectationsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def freshStore(): String =
    Files.createTempDirectory("graft_sexpect_").toString + "/entities"

  private def batchDf(rows: (Long, Long)*) =
    rows.toSeq.toDF("k", "amount_c")

  test("guarded upsert commits pass rows; rejects land per batch; replay is idempotent") {
    val store = freshStore()
    Expectations.declare(spark, store, Seq(("amount_nonneg", "amount_c >= 0")))
    // batch 0: two pass, one reject
    val v0 = Expectations.guardedUpsertBatch(
      batchDf(1L -> 10L, 2L -> -5L, 3L -> 7L), store, 0L, "k")
    assert(v0.contains(1))
    val stored = VersionedStore.readVersion(spark, store, 1)
    assert(stored.count() == 2 && stored.filter(col("amount_c") < 0).count() == 0)
    val q0 = spark.read.parquet(Expectations.quarantineBatchPath(store, 0L))
    assert(q0.count() == 1 && q0.head().getAs[String]("violated") == "amount_nonneg")

    // batch 1: ALL rows reject — no version commits, the reason is recorded
    val v1 = Expectations.guardedUpsertBatch(
      batchDf(4L -> -1L, 5L -> -2L), store, 1L, "k")
    assert(v1.isEmpty, "an all-reject batch must not commit a version")
    assert(VersionedStore.versions(spark, store) == Seq(1))
    assert(spark.read.parquet(Expectations.quarantineBatchPath(store, 1L))
      .count() == 2)

    // checkpoint replay of batch 0: the store commit is skipped by its
    // txn marker; the quarantine regenerates bit-identically (Overwrite)
    val before = Expectations.quarantineBatches(spark, store)
      .collect().map(_.toSeq).toSet
    val vr = Expectations.guardedUpsertBatch(
      batchDf(1L -> 10L, 2L -> -5L, 3L -> 7L), store, 0L, "k")
    assert(vr.isEmpty, "replayed batch id must not commit twice")
    assert(VersionedStore.versions(spark, store) == Seq(1))
    val after = Expectations.quarantineBatches(spark, store)
      .collect().map(_.toSeq).toSet
    assert(after == before, "replay must regenerate, not duplicate")
    // the union relation carries the batch id
    assert(Expectations.quarantineBatches(spark, store)
      .select(col("batch_id")).distinct().collect()
      .map(_.getLong(0)).toSet == Set(0L, 1L))
  }

  test("a store without expectations streams through unguarded") {
    val store = freshStore()
    val v = Expectations.guardedUpsertBatch(
      batchDf(1L -> -10L, 2L -> 5L), store, 0L, "k")
    assert(v.contains(1))
    assert(VersionedStore.readVersion(spark, store, 1).count() == 2)
    assert(Expectations.quarantineBatches(spark, store).count() == 0)
  }

  test("batch-quarantine retention keeps the newest k directories") {
    val store = freshStore()
    Expectations.declare(spark, store, Seq(("amount_nonneg", "amount_c >= 0")))
    (0L to 3L).foreach { b =>
      Expectations.guardedUpsertBatch(
        batchDf((10 + b) -> 1L, (20 + b) -> -1L), store, b, "k")
    }
    assert(Expectations.quarantineBatches(spark, store).count() == 4)
    val reclaimed = Expectations.vacuumBatchQuarantine(spark, store, 2)
    assert(reclaimed == 2)
    assert(Expectations.quarantineBatches(spark, store)
      .select(col("batch_id")).distinct().collect()
      .map(_.getLong(0)).toSet == Set(2L, 3L))
  }
}
