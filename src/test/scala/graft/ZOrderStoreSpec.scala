package graft

import java.nio.file.Files

import graft.sources.ZOrderStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The z-order layout's contract: the SAME box predicate over the SAME
  * rows reads fewer rows from the z-ordered layout than from the
  * time-sorted layout, because row-group stats become selective on both
  * dimensions — and the answers are identical (layout never changes
  * results). Uses sf0.01 (10k events): enough rows for 64 meaningful
  * row-group ranges. */
class ZOrderStoreSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf01 = "/root/testdata/sf0.01"

  test("z-layout prunes a 2-d box on both dimensions; results unchanged") {
    val ev = Tables.eventsTs(spark, sf01)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
    val r = ev.agg(min("user_id"), max("user_id"), min("ts_us"), max("ts_us")).head()
    val (umn, umx, tmn, tmx) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (ulo, uhi) = (umn + (umx - umn + 1) * 2 / 10, umn + (umx - umn + 1) * 3 / 10)
    val (tlo, thi) = (tmn + (tmx - tmn + 1) * 4 / 10, tmn + (tmx - tmn + 1) * 5 / 10)

    val dir = Files.createTempDirectory("zstore").toFile
    try {
    val zPath = dir.getAbsolutePath + "/z"
    val tPath = dir.getAbsolutePath + "/t"
    ZOrderStore.writeZOrdered(ev, zPath, files = 64)
    ZOrderStore.writeTimeSorted(ev, tPath, files = 64)

    def boxScan(path: String): (Set[Long], Long) = {
      val df = spark.read.parquet(path)
        .filter(col("user_id") >= ulo && col("user_id") < uhi &&
          col("ts_us") >= tlo && col("ts_us") < thi)
      val ids = df.collect().map(_.getAs[Long]("event_id")).toSet
      val scan = df.queryExecution.executedPlan.collectFirst {
        case s: FileSourceScanExec => s
      }.getOrElse(fail(s"no FileSourceScanExec for $path"))
      (ids, scan.metrics("numOutputRows").value)
    }

    val (zIds, zRows) = boxScan(zPath)
    val (tIds, tRows) = boxScan(tPath)
    assert(zIds.nonEmpty, "box selects no rows — test is vacuous")
    assert(zIds == tIds, "layouts disagree on the box contents")
    // time-sorted prunes the time decile only (~10% of groups survive);
    // z-sorted additionally prunes the user decile inside it
    assert(zRows < tRows,
      s"z-layout read $zRows rows, time-sorted read $tRows — no 2-d pruning win")
    val total = ev.count()
    assert(tRows < total, "time layout pruned nothing; row groups too coarse")
    } finally {
      // deleteOnExit cannot remove populated directories; clean up the
      // two written stores recursively (the ManifestStoreSpec rule)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(dir)
    }
  }
}
