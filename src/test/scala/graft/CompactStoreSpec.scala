package graft

import java.nio.file.Files

import graft.sources.CompactStore
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compaction's contract: the rewrite reduces the file count to the
  * byte-sized target, changes NO row, and restores pruning — a literal
  * time predicate over the compacted (sorted) layout reads fewer rows
  * than over the fragmented layout. Uses sf0.01 (10k events) so the
  * fragmented store's 96 files and the compacted row groups are both
  * meaningful. */
class CompactStoreSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf01 = "/root/testdata/sf0.01"

  test("compact hits the sized file count, preserves content, restores pruning") {
    val ev = Tables.eventsTs(spark, sf01)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("event_type"), col("value"))
    val dir = Files.createTempDirectory("compact").toFile
    try {
      val frag = dir.getAbsolutePath + "/frag"
      val out = dir.getAbsolutePath + "/v2"
      CompactStore.writeFragmented(ev, frag, files = 96)
      val (fragBytes, fragFiles) = CompactStore.dataFiles(spark, frag)
      assert(fragFiles == 96, s"fragmented store has $fragFiles files")

      // target a quarter of the store per file → expect ~4 output files
      val target = math.max(1L, fragBytes / 4)
      val planned = CompactStore.compact(spark, frag, out, target)
      val (_, outFiles) = CompactStore.dataFiles(spark, out)
      assert(planned == (fragBytes + target - 1) / target,
        "compact did not size output from the byte listing")
      // repartitionByRange may yield FEWER non-empty partitions than
      // planned when ts_us values are heavily duplicated (empty
      // partitions write no file) — the sizing contract is the plan and
      // the 8x reduction below, not an exact file count
      assert(outFiles >= 1 && outFiles <= planned,
        s"wrote $outFiles files, planned $planned")
      assert(outFiles < fragFiles / 8,
        s"compaction barely reduced files: $fragFiles -> $outFiles")

      // content identity, both directions (no row lost, none invented)
      val a = spark.read.parquet(frag)
      val b = spark.read.parquet(out)
      assert(a.count() == b.count())
      assert(a.except(b).isEmpty && b.except(a).isEmpty,
        "compacted store content differs from fragmented store")

      // pruning: one time decile over each layout — same answer, fewer
      // rows read from the sorted layout (tight row-group stats)
      val r = b.agg(min(col("ts_us")), max(col("ts_us"))).head()
      val (tmn, tmx) = (r.getLong(0), r.getLong(1))
      val (tlo, thi) = (tmn + (tmx - tmn + 1) * 3 / 10, tmn + (tmx - tmn + 1) * 4 / 10)
      def probe(path: String): (Set[Long], Long) = {
        val df = spark.read.parquet(path)
          .filter(col("ts_us") >= tlo && col("ts_us") < thi)
        val ids = df.collect().map(_.getAs[Long]("event_id")).toSet
        val scan = df.queryExecution.executedPlan.collectFirst {
          case sc: FileSourceScanExec => sc
        }.getOrElse(fail(s"no FileSourceScanExec for $path"))
        (ids, scan.metrics("numOutputRows").value)
      }
      val (fIds, fRows) = probe(frag)
      val (cIds, cRows) = probe(out)
      assert(cIds.nonEmpty && cIds == fIds, "layouts disagree on probe contents")
      assert(cRows < fRows,
        s"compacted layout read $cRows rows vs fragmented $fRows — no pruning win")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(dir)
    }
  }
}
