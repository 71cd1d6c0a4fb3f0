package graft

import graft.sources.KnnGraphStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted graph must serve the SAME centrality bits as the
  * in-memory tier: the walk is exact integer arithmetic over the edge
  * longs, so a correct store roundtrip is bit-invisible. */
class KnnGraphStoreSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.01"

  test("q96c serves bit-identically to q96b from the persisted edges") {
    val fromStore = KnnGraphStore.q96cKnnCentralityIndex(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val inMemory = operators.Similarity.q96bKnnCentralityLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(fromStore.nonEmpty, "store walk returned nothing — vacuous")
    assert(fromStore == inMemory,
      s"persisted-graph centrality diverged:\n  store=$fromStore\n  mem=$inMemory")
    // the store really holds degrees (the variable-degree division's
    // input), and they are each node's true edge fan-out
    val e = spark.read.parquet(KnnGraphStore.store(spark, sf))
    val bad = e.groupBy(col("src"), col("deg"))
      .agg(count(lit(1)).as("c"))
      .filter(col("deg") =!= col("c")).count()
    assert(bad == 0, s"$bad nodes carry a degree != their edge count")
  }

  test("layout is data-sized and per-node reads open a file subset") {
    val path = KnnGraphStore.store(spark, sf)
    val edges = spark.read.parquet(path)
    val allFiles = edges.inputFiles.length
    // the store sizes its file count from the edge count (the
    // CompactStore ceil(bytes/target) rule) — at the gated scale's
    // 16 KiB target that MUST yield a multi-file layout, the pruning
    // precondition (a hardcoded count is exactly what this pins against)
    // upper bound only: repartitionByRange may leave empty partitions
    // (no part file) on skewed src sampling, so exact equality is flaky
    // (advice finding); the load-bearing claims are data-sized (not a
    // hardcoded count) and multi-file (the pruning precondition)
    val expected = math.max(1L, (edges.count() * 32L + (16L << 10) - 1) / (16L << 10))
    assert(allFiles >= 2 && allFiles <= expected,
      s"store has $allFiles files, edge-count sizing expects 2..$expected")
    // a per-node adjacency read opens only the manifest-selected subset
    val src = edges.select(col("src")).orderBy(col("src")).head.getLong(0)
    val nbrs = KnnGraphStore.neighbors(spark, path, src)
    assert(nbrs.count() > 0, "probe node has no adjacency rows — vacuous")
    val opened = nbrs.inputFiles.length
    assert(opened < allFiles,
      s"per-node read opened $opened of $allFiles files — no pruning")
    // and the pruned read serves the SAME rows as the full-scan filter
    val full = edges.filter(col("src") === src)
      .collect().map(_.toSeq).sortBy(_.toString)
    val pruned = nbrs.collect().map(_.toSeq).sortBy(_.toString)
    assert(pruned.toSeq == full.toSeq, "pruned adjacency read diverged")
  }
}
