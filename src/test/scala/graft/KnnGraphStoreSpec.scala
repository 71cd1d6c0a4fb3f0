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

  test("entry points are persisted at build time and bit-equal the quartile rule") {
    // round-14 verdict #1: the probe used to recompute its entries with
    // a full edge-relation scan per call; the build now persists them as
    // a one-row side relation. Bit-identity of the persisted entries
    // with the quartile recompute ⇒ the probe's results are bit-identical
    // to the pre-persistence probe on the same store.
    val path = KnnGraphStore.store(spark, sf)
    val persisted = spark.read.parquet(KnnGraphStore.entriesPath(path))
      .head().getSeq[Long](0).toSeq
    val recomputed = spark.read.parquet(path).filter(col("src") =!= 0L)
      .agg(percentile_approx(col("src"),
        array(lit(0.0), lit(0.25), lit(0.5), lit(0.75)), lit(10000)))
      .head().getSeq[Long](0).toSeq
    assert(persisted.nonEmpty, "entries side relation is empty — vacuous")
    assert(persisted == recomputed,
      s"persisted entries $persisted != quartile recompute $recomputed")
    // and the side relation is tiny: one file, one row — bounded driver
    // state for the serving loop, never a scan
    val df = spark.read.parquet(KnnGraphStore.entriesPath(path))
    assert(df.count() == 1 && df.inputFiles.length == 1,
      "entries must be a one-row, one-file side relation")
  }

  test("q96d graph probe: bounded hops, deterministic, recall at/above the IVF tier") {
    // the HNSW-family stop rule must CONVERGE well inside the hop bound
    // (wall tracks hops, not store rows — the smoke's flatness claim)
    val (best, hops) = KnnGraphStore.graphProbeDetailed(spark, sf,
      k = 10, beam = 8, maxHops = 32)
    assert(best.size == 10, s"probe returned ${best.size} rows")
    assert(hops > 0 && hops < 32,
      s"probe used $hops hops — did not converge before the bound")
    // deterministic: a second probe of the same store returns the list
    val (again, _) = KnnGraphStore.graphProbeDetailed(spark, sf,
      k = 10, beam = 8, maxHops = 32)
    assert(again == best, "graph probe is not deterministic")
    // results are honestly ranked: cosines non-increasing, no query vec
    assert(best.map(_._2) == best.map(_._2).sorted.reverse)
    assert(!best.exists(_._1 == 0L), "the query vector leaked into its own result")
    // recall@10 vs the exact scan, at or above the IVF serving tier's —
    // the graph family must not be a strictly worse way to serve ANN
    val exact = operators.Similarity.q50KnnBrute(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val graphRecall = (exact & best.map(_._1).toSet).size.toDouble / exact.size
    val ivf = operators.Similarity.q92IvfKmeans(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val ivfRecall = (exact & ivf).size.toDouble / exact.size
    assert(graphRecall >= ivfRecall,
      s"graph recall $graphRecall below the IVF tier's $ivfRecall")
    assert(graphRecall >= 0.5, s"graph recall@10 too low: $graphRecall")
    // the gated entry serves the same list through a DataFrame
    val gated = KnnGraphStore.q96dKnnGraphProbe(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(gated == best, "gated q96d diverged from the detailed probe")
  }
}
