package graft

import java.nio.file.Files

import graft.sources.PartitionedStore
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class PartitionedStoreSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("partitioned write lays out lang directories and reads prune to them") {
    val dir = Files.createTempDirectory("pstore").toFile
    dir.deleteOnExit()
    val out = dir.getAbsolutePath + "/docs"
    PartitionedStore.write(
      Tables.documents(spark, sf), out,
      partitionCols = Seq("lang"), sortCols = Seq("doc_id"))

    val langDirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(langDirs.exists(_.startsWith("lang=")), s"no partition dirs: $langDirs")

    val filtered = PartitionedStore.read(spark, out).filter(col("lang") === "en")
    // round-trip correctness; collect() (not count()) so the execution
    // runs THIS DataFrame's queryExecution and populates its scan metrics
    val expected = Tables.documents(spark, sf)
      .filter(col("lang") === "en").count()
    assert(filtered.collect().length == expected)

    // the scan must carry the lang predicate as a PARTITION filter
    // (directory pruning), not a data filter over all files
    val scan = filtered.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "lang")),
      s"lang not in partitionFilters: ${scan.partitionFilters}")
    // after execution (count above), the scan's file metric must show it
    // read only lang=en's files, not the whole store
    def countFiles(p: String): Long = {
      val f = new java.io.File(p)
      if (f.isDirectory) f.listFiles().map(c => countFiles(c.getAbsolutePath)).sum
      else if (f.getName.endsWith(".parquet")) 1L else 0L
    }
    val enFiles = countFiles(s"$out/lang=en")
    val allFiles = countFiles(out)
    assert(allFiles > enFiles, "store has only one partition, test is vacuous")
    assert(scan.metrics("numFiles").value == enFiles,
      s"scanned ${scan.metrics("numFiles").value} files, expected $enFiles of $allFiles")
  }
}
