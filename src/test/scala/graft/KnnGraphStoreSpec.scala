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

  test("layered descent: strictly fewer hops, no worse recall, on a planted ring") {
    // round-14 verdict #2. A 1024-node RING (unit circle, ids in angular
    // order): every node's kNN edges are its angular neighbors, so a
    // flat walk's reach grows ~beam-width positions per hop — the
    // O(diameter) regime the sampled upper layers exist for. The
    // hierarchy must find the same (or better) top-10 in strictly fewer
    // total hops.
    import spark.implicits._
    val n = 1024
    val vecs = (1 to n).map { i =>
      val th = 2 * math.Pi * i / n
      (i.toLong, Seq(math.cos(th), math.sin(th)), 1.0)
    }.toDF("vec_id", "e", "n2")
    val path = java.nio.file.Files.createTempDirectory("graft_ring_")
      .toString + "/g"
    KnnGraphStore.buildFromVectors(spark, vecs, path, targetFileBytes = 16L << 10)
    val meta = spark.read.parquet(KnnGraphStore.layersMetaPath(path)).head()
    assert(meta.getInt(0) >= 1, "planted corpus built no upper layers — vacuous")
    // the query angle sits far from every quartile entry (ids are in
    // angular order, so entry ids ≈ entry angles); exact driver-side
    // scorer — cosine of unit 2-D vectors is cos(Δθ)
    val qth = 2 * math.Pi * 0.37
    val score: Seq[Long] => Seq[(Long, Double)] =
      ids => ids.map(id => (id, math.cos(2 * math.Pi * id / n - qth)))
    val (flat, flatHops) = KnnGraphStore.probeFlat(spark, path, score,
      k = 10, beam = 8, maxHops = 96, ef = 48)
    val (lay, layHops) = KnnGraphStore.probeLayered(spark, path, score,
      k = 10, beam = 8, maxHops = 96, ef = 48)
    val exact = (1 to n).map(i =>
      (i.toLong, math.cos(2 * math.Pi * i / n - qth)))
      .sortBy(t => (-t._2, t._1)).take(10).map(_._1).toSet
    def recall(r: Seq[(Long, Double)]) =
      (exact & r.map(_._1).toSet).size.toDouble / exact.size
    assert(recall(lay) >= recall(flat),
      s"layered recall ${recall(lay)} below flat ${recall(flat)}")
    assert(recall(lay) >= 0.9, s"layered recall too low: ${recall(lay)}")
    assert(layHops < flatHops,
      s"descent used $layHops hops vs flat $flatHops — no hierarchy win")
    // determinism of the layered path
    val (again, h2) = KnnGraphStore.probeLayered(spark, path, score,
      k = 10, beam = 8, maxHops = 96, ef = 48)
    assert(again == lay && h2 == layHops, "layered probe not deterministic")
    // a corpus too small for a hierarchy (n/8 < MinLayerMembers) builds
    // no layers, and its layered probe DEGENERATES to the flat walk —
    // bit-identical output, same hop count
    val tiny = (1 to 100).map { i =>
      val th = 2 * math.Pi * i / 100
      (i.toLong, Seq(math.cos(th), math.sin(th)), 1.0)
    }.toDF("vec_id", "e", "n2")
    val tpath = java.nio.file.Files.createTempDirectory("graft_tinyring_")
      .toString + "/g"
    KnnGraphStore.buildFromVectors(spark, tiny, tpath, targetFileBytes = 16L << 10)
    assert(spark.read.parquet(KnnGraphStore.layersMetaPath(tpath))
      .head().getInt(0) == 0, "tiny corpus built layers — threshold broken")
    val tscore: Seq[Long] => Seq[(Long, Double)] =
      ids => ids.map(id => (id, math.cos(2 * math.Pi * id / 100 - qth)))
    val (tf, tfh) = KnnGraphStore.probeFlat(spark, tpath, tscore,
      k = 10, beam = 8, maxHops = 96, ef = 48)
    val (tl, tlh) = KnnGraphStore.probeLayered(spark, tpath, tscore,
      k = 10, beam = 8, maxHops = 96, ef = 48)
    assert(tl == tf && tlh == tfh,
      "layerless store's layered probe diverged from the flat walk")
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
    // the layered dir probe serves the same CONTRACT on this store
    // (k ranked rows, deterministic) — it is the diameter-bound serving
    // path, not the gated default (measured crossover in the scaladoc)
    val (layered, _) = KnnGraphStore.graphProbeLayeredDetailed(spark, sf,
      k = 10, beam = 8, maxHops = 32)
    assert(layered.size == 10 &&
      layered.map(_._2) == layered.map(_._2).sorted.reverse)
  }
}
