package graft

import graft.streaming.{ChangelogSink, MvMaintenance, Streams}
import graft.streaming.Streams.OrderEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The changelog-driven view must track the store EXACTLY, batch by
  * batch, without ever reading it: after every fold the maintained
  * aggregate equals the from-scratch aggregate of the store, an entity
  * whose bucket changes is retracted from its old bucket, and a
  * replayed batch (an empty changelog by ChangelogSink's no-op rule)
  * folds as a no-op. */
class MvMaintenanceSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def mvRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  private def storeMv(store: String) = MvMaintenance.mvOf(
    graft.streaming.UpsertSink.readStore(spark, store)
      .select(col("custkey"), col("totalTrips"), col("totalAmount")))

  test("changelog folds keep the view identical to the store aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_mvm_").toString
    val (store, cdc, ckpt) = (s"$base/entities", s"$base/cdc", s"$base/ckpt")
    val in = MemoryStream[OrderEvent]
    val q = ChangelogSink.writeTo(Streams.entityStream(in.toDS()), store, cdc, ckpt)
    try {
      // bootstrap: the view of an empty store
      var mv = MvMaintenance.mvOf(
        Seq.empty[(Long, Long, Double)].toDF("custkey", "totalTrips", "totalAmount"))

      // batch 0: key 1 lands 9 trips (bucket 0), key 2 lands 3
      in.addData((1 to 9).map(i => OrderEvent(1, i.toDouble, "O")) ++
        (1 to 3).map(i => OrderEvent(2, 1.0, "F")): _*)
      q.processAllAvailable()
      mv = MvMaintenance.applyChangelog(mv, spark.read.parquet(s"$cdc/batch_0"))
      assert(mvRows(mv) == mvRows(storeMv(store)),
        "view drifted from the store aggregate after batch 0")

      // batch 1: key 1 crosses into bucket 1 (9 -> 11 trips) — the
      // UPDATE image must RETRACT it from bucket 0; key 3 is new
      in.addData(OrderEvent(1, 2.0, "O"), OrderEvent(1, 2.0, "O"),
        OrderEvent(3, 5.0, "P"))
      q.processAllAvailable()
      mv = MvMaintenance.applyChangelog(mv, spark.read.parquet(s"$cdc/batch_1"))
      val after = mvRows(mv)
      assert(after == mvRows(storeMv(store)),
        "view drifted from the store aggregate after batch 1")
      // bucket movement really happened: bucket 1 exists and holds key 1
      assert(after.exists(_._1 == 1L), s"no bucket-1 row after the move: $after")
      // bucket 0 no longer counts key 1 (2 and 3 remain)
      assert(after.find(_._1 == 0L).exists(_._2 == 2L),
        s"old bucket not retracted: $after")

      // a replayed identical batch classifies to an EMPTY changelog and
      // folds as a no-op
      val replayImages = ChangelogSink.classify(
        spark.createDataset(Seq(
          Streams.EntityUpdate(3, "Untouched", 1, 5.0, 5.0, 1, 0))), store)
      assert(replayImages.isEmpty)
      val folded = MvMaintenance.applyChangelog(mv, replayImages)
      assert(mvRows(folded) == after, "empty changelog changed the view")
    } finally q.stop()
  }
}
