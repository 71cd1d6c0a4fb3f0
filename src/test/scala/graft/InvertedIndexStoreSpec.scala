package graft

import java.nio.file.Files

import graft.sources.InvertedIndexStore
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The inverted index's contract: the point-query probe returns
  * BIT-IDENTICAL BM25 results to q86's corpus scan (same arithmetic,
  * same SQL twin), while reading only the query terms' postings — the
  * manifest opens a strict subset of the index files, and the
  * term-sorted layout lets the scan emit a strict subset of the opened
  * files' rows. */
class InvertedIndexStoreSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.01"

  test("q86b index probe scores bit-identically to q86's corpus scan") {
    val fromIndex = sources.InvertedIndexStore.q86bBm25Index(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val fromCorpus = operators.Text.q86Bm25(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(fromIndex.nonEmpty, "probe returned nothing — vacuous")
    assert(fromIndex == fromCorpus,
      s"index probe diverged from corpus scan:\n  index=$fromIndex\n  corpus=$fromCorpus")
  }

  test("probe opens only manifest-selected files and reads only matching postings") {
    val dir = Files.createTempDirectory("invidx").toFile
    val path = dir.getAbsolutePath + "/postings"
    try {
      InvertedIndexStore.build(Tables.documents(spark, sf), path, files = 16)
      val manifest = spark.read.parquet(InvertedIndexStore.manifestPath(path))
      val total = manifest.count()
      val terms = operators.Text.Bm25Query
      val selected = InvertedIndexStore.filesFor(manifest, terms)
      // the query's 3 terms land in at most 3 term-range files; a probe
      // that opened the whole index would defeat the store's purpose
      assert(selected.nonEmpty && selected.length < total,
        s"manifest pruned nothing: ${selected.length} of $total files")

      val probe = spark.read.parquet(selected: _*)
        .filter(col("term").isin(terms: _*))
      probe.collect()
      val scan = probe.queryExecution.executedPlan.collectFirst {
        case s: FileSourceScanExec => s
      }.getOrElse(fail("no FileSourceScanExec"))
      assert(scan.metrics("numFiles").value == selected.length,
        s"opened ${scan.metrics("numFiles").value} files, planned ${selected.length}")
      // the term predicate reaches the parquet reader (row-group skip
      // inside multi-group files at production sizes; at this test scale
      // each small file is one row group, so file-level pruning above is
      // the observable skip)
      assert(scan.metadata("PushedFilters").contains("In(term"),
        s"term filter not pushed: ${scan.metadata("PushedFilters")}")
      // the probe touches a vanishing fraction of the index: the opened
      // files' combined postings are far below the full posting count
      val allPostings = spark.read.parquet(path).count()
      assert(scan.metrics("numOutputRows").value < allPostings / 4,
        s"probe read ${scan.metrics("numOutputRows").value} of $allPostings postings")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(dir)
    }
  }
}
