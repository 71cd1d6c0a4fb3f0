package graft

import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("q51 LSH ANN finds a meaningful fraction of the true top-10") {
    val exact = operators.Similarity.q50KnnBrute(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val ann = operators.Similarity.q51KnnLsh(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(ann.nonEmpty, "LSH returned no candidates")
    val recall = (exact & ann).size.toDouble / exact.size
    // Hamming<=2 multiprobe measures 0.6 here (0.8 at sf0.1) on the
    // near-orthogonal worst case, up from 0.2 single-probe; threshold
    // keeps margin for the fixed-seed determinism of the testdata.
    assert(recall >= 0.5, s"recall@10 too low: $recall (ann=$ann exact=$exact)")
  }

  test("q51 probes fewer vectors than brute force") {
    // candidate set must be a strict subset of the corpus, else LSH
    // degenerated to brute force
    val n = Tables.embeddings(spark, sf).count()
    val annRows = operators.Similarity.q51KnnLsh(spark, sf).count()
    assert(annRows <= 10)
    assert(n > 10, "corpus too small for the test to mean anything")
  }

  test("q53 centroid probe results are a subset of the probed cells") {
    val rows = operators.Similarity.q53CentroidSearch(spark, sf).collect()
    assert(rows.nonEmpty)
    val labels = rows.map(_.getInt(1)).toSet
    assert(labels.size <= 2, s"probe leaked outside 2 cells: $labels")
  }

  test("q92 learned-IVF: probe-all equals the exact scan; recall monotone in nprobe") {
    val exact = operators.Similarity.q50KnnBrute(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // nprobe = k probes every cell -> EXACTLY the exact scan (ids and
    // cosines), the strongest law an IVF can state
    val all = operators.Similarity.ivfKmeans(spark, sf,
      nprobe = operators.Similarity.IvfCells)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(all.toSeq == exact.toSeq,
      s"probe-all IVF diverged from exact scan:\n$all\nvs\n$exact")
    // nested probed cells -> monotone recall
    val exactIds = exact.map(_._1).toSet
    val byProbe = Seq(1, 2, operators.Similarity.IvfCells).map { np =>
      val ids = operators.Similarity.ivfKmeans(spark, sf, np)
        .collect().map(_.getLong(0)).toSet
      (exactIds & ids).size.toDouble / exactIds.size
    }
    assert(byProbe == byProbe.sorted, s"q92 recall not monotone: $byProbe")
    assert(byProbe.last == 1.0)
    // results only come from probed cells
    val one = operators.Similarity.ivfKmeans(spark, sf, 1).collect()
    assert(one.map(_.getInt(1)).toSet.size <= 1, "nprobe=1 leaked cells")
  }

  test("ANN recall knobs: recall rises monotonically with nprobe and tables") {
    val exact = operators.Similarity.q50KnnBrute(spark, sf)
      .collect().map(_.getLong(0)).toSet
    def recallOf(ids: Set[Long]): Double = (exact & ids).size.toDouble / exact.size

    // q53 nprobe: probed cell sets are nested (top-k cells ⊆ top-(k+1)),
    // so recall is deterministically non-decreasing, and probing every
    // cell IS the exact scan
    val nCells = Tables.embeddings(spark, sf)
      .select(org.apache.spark.sql.functions.col("label")).distinct().count().toInt
    val byProbe = Seq(1, 2, nCells).map { np =>
      recallOf(operators.Similarity.centroidSearch(spark, sf, nprobe = np)
        .collect().map(_.getLong(0)).toSet)
    }
    assert(byProbe == byProbe.sorted,
      s"q53 recall not monotone in nprobe: $byProbe")
    assert(byProbe.last == 1.0,
      s"nprobe = #cells must equal the exact scan, recall ${byProbe.last}")

    // q51 tables: the seed-7 plane stream nests table sets (planes for t
    // tables are a prefix of those for t' > t at fixed bits), so the
    // candidate set — and recall — is monotone in tables by construction
    val byTables = Seq(3, 6, 12).map { t =>
      recallOf(operators.Similarity.knnLsh(spark, sf, tables = t)
        .collect().map(_.getLong(0)).toSet)
    }
    assert(byTables == byTables.sorted,
      s"q51 recall not monotone in tables: $byTables")
    assert(byTables.last >= 0.5, s"full-table recall too low: ${byTables.last}")
  }

  test("q52b LSH pair search retrieves planted near-duplicate pairs") {
    // The scale path's contract is the production regime: real near-dups
    // (cos ~1) must be retrieved with probability ~1 through the bucketed
    // candidate join. Plant one jittered duplicate per label on top of
    // gaussian noise and require it to surface as the label's top pair.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(42)
    val base = (0 until 40).map { i =>
      (i.toLong, i % 4, Array.fill(64)(rnd.nextGaussian())) }
    val planted = base.take(4).map { case (id, lab, e) =>
      (1000L + id, lab, e.map(x => x + rnd.nextGaussian() * 0.01)) }
    val v = (base ++ planted).toDF("vec_id", "label", "e")
      .withColumn("n2", functions.VectorOps.norm2(col("e")))
    val top1 = operators.Similarity.pairwiseTopkLsh(v).collect()
      .filter(_.getLong(1) == 1L)
      .map(r => r.getInt(0) -> (r.getLong(2), r.getLong(3))).toMap
    (0 until 4).foreach { lab =>
      assert(top1.get(lab).contains((lab.toLong, 1000L + lab)),
        s"label $lab top pair was ${top1.get(lab)}, expected ($lab, ${1000 + lab})")
    }
  }

  test("q73b approximate kNN graph: planted duplicates are mutual rank-1; lists ranked") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(42)
    val base = (0 until 40).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian())))
    val planted = base.take(4).map { case (id, e) =>
      (1000L + id, e.map(x => x + rnd.nextGaussian() * 0.01)) }
    // exact replicas exercise the digest-canonicalization path: a copy's
    // rank-1 must be its original at cosine exactly 1.0 (and vice versa)
    val copies = base.drop(10).take(2).map { case (id, e) => (2000L + id, e.clone()) }
    val v = (base ++ planted ++ copies).toDF("vec_id", "e")
      .withColumn("n2", functions.VectorOps.norm2(col("e")))
    val g = operators.Similarity.approxKnnGraph(v).collect()
    val rank1 = g.filter(_.getLong(1) == 1L)
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    (0 until 4).foreach { i =>
      assert(rank1.get(i.toLong).exists(_._1 == 1000L + i),
        s"node $i rank-1 was ${rank1.get(i.toLong)}, expected ${1000 + i}")
      assert(rank1.get(1000L + i).exists(_._1 == i.toLong),
        s"node ${1000 + i} rank-1 was ${rank1.get(1000L + i)}, expected $i")
    }
    Seq(10L, 11L).foreach { i =>
      assert(rank1.get(i).contains((2000L + i, 1.0)),
        s"node $i rank-1 was ${rank1.get(i)}, expected exact copy at cos 1.0")
      assert(rank1.get(2000L + i).contains((i, 1.0)),
        s"copy ${2000 + i} rank-1 was ${rank1.get(2000L + i)}, expected $i")
    }
    g.groupBy(_.getLong(0)).foreach { case (id, rs) =>
      assert(rs.length <= 3, s"node $id has ${rs.length} neighbors")
      val byRk = rs.sortBy(_.getLong(1))
      assert(byRk.map(_.getLong(1)).sameElements(1L to byRk.length))
      val cs = byRk.map(_.getDouble(3))
      assert(cs.sameElements(cs.sortBy(-(_: Double))), s"node $id not ranked")
      assert(!rs.exists(_.getLong(2) == id), s"node $id lists itself")
    }
  }

  test("q79 JL projection preserves squared distances within the k=16 budget") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(17)
    val v = (0 until 60).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian())))
      .toDF("vec_id", "e")
    val rows = operators.Similarity.projectionDistortion(v).collect()
    assert(rows.length == 60 * 59 / 2)
    val relErr = rows.map { r =>
      val (d2, pd2) = (r.getDouble(0), r.getDouble(1))
      math.abs(pd2 - d2) / d2
    }
    // E[rel distortion] ~ sqrt(2/k) ~ 0.35 at k=16; the MEAN over ~1.8k
    // pairs concentrates hard, 0.5 leaves noise margin
    val mean = relErr.sum / relErr.length
    assert(mean < 0.5, s"mean JL distortion too high: $mean")
    assert(relErr.count(_ < 1.0).toDouble / relErr.length > 0.9,
      "distortion tail too heavy — projection matrix suspect")
  }

  test("q79 projected scan ranks a planted duplicate of the query first") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(23)
    val base = (0 until 50).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian())))
    // identical copy of the query vector: distance 0 projects to 0
    // EXACTLY, so rank 1 is deterministic, not probabilistic
    val v = (base :+ (999L, base.head._2.clone())).toDF("vec_id", "e")
    val top = operators.Similarity.projectedKnn(v).collect().head
    assert(top.getLong(0) == 999L, s"planted dup not rank 1: $top")
    assert(top.getDouble(1) > 0.999999, s"projected cos of identical vec: $top")
  }

  test("q54 8-bit quantized scan tracks the exact top-10 on noise") {
    val exact = operators.Similarity.q50KnnBrute(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val rows = operators.Similarity.q54KnnQuantized(spark, sf).collect()
    assert(rows.length == 10)
    val got = rows.map(_.getLong(0)).toSet
    val recall = (exact & got).size.toDouble / exact.size
    // The testdata's top-10 are near-ties (cos ~0.3 on orthogonal
    // noise, gaps smaller than the ~0.005 quantization jitter), so set
    // overlap is genuinely fuzzy at the boundary — 0.6 measured; the
    // deterministic high-similarity contract is the planted test below.
    assert(recall >= 0.5, s"quantized recall@10 too low: $recall")
    val scores = rows.map(_.getDouble(1))
    assert(scores.sameElements(scores.sortBy(-_)), "not sorted by qcos desc")
    assert(scores.forall(s => s >= -1.0000001 && s <= 1.0000001),
      "quantized cosine outside [-1,1]")
  }

  test("q54 ranks a planted near-duplicate of the query first") {
    // Production regime: anything truly similar (cos ~1) must survive
    // quantization with its rank intact — 8-bit jitter (~0.005) cannot
    // close a 0.7 cosine gap.
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dir = java.nio.file.Files.createTempDirectory("q54_vecs").toFile
    dir.deleteOnExit()
    val query = Array.fill(64)(rnd.nextGaussian().toFloat)
    val dup = query.map(x => x + rnd.nextGaussian().toFloat * 0.01f)
    val noise = (1 until 40).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat), i % 4))
    (Seq((0L, query, 0), (999L, dup, 1)) ++ noise)
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(dir.getAbsolutePath + "/embeddings.parquet")
    val top = operators.Similarity.q54KnnQuantized(spark, dir.getAbsolutePath)
      .collect().head
    assert(top.getLong(0) == 999L, s"planted dup not rank 1: $top")
    assert(top.getDouble(1) > 0.99, s"planted dup qcos suspiciously low: $top")
  }

  test("q52 returns at most 3 ranked pairs per label, ordered") {
    val rows = operators.Similarity.q52PairwiseTopk(spark, sf).collect()
    val byLabel = rows.groupBy(_.getInt(0))
    byLabel.foreach { case (l, rs) =>
      assert(rs.length <= 3, s"label $l has ${rs.length} pairs")
      val coss = rs.sortBy(_.getLong(1)).map(_.getDouble(4))
      assert(coss.sameElements(coss.sortBy(-_)), s"label $l not rank-ordered")
    }
  }

  test("pageRank concentrates rank on a planted star hub, conserving mass") {
    import spark.implicits._
    val vertices = (0L to 5L).toDF("vec_id")
    // leaves 1..5 each point at hub 0; hub points at 1 (out-degree 1)
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (5L, 0L), (0L, 1L))
      .toDF("src", "dst")
    // one round: hub absorbs all five leaf shares (a second round would
    // hand the hub's mass on to node 1 — the expected cycle dynamics)
    val ranks = operators.Similarity.pageRank(vertices, edges, outDeg = 1, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks.size == 6)
    val hub = ranks(0L)
    (1L to 5L).foreach(i => assert(hub > ranks(i), s"hub $hub !> node $i ${ranks(i)}"))
    assert(hub == 150000000000L + 85L * 5000000000000L / 100L, hub.toString)
    // out-degree 1 means no floor loss: damped mass is conserved exactly
    assert(ranks.values.sum == 6L * 1000000000000L, ranks.toString)
  }

  test("pageRankVarDeg divides by each node's actual out-degree, exactly") {
    import spark.implicits._
    val vertices = (0L to 3L).toDF("vec_id")
    // node 1 -> 0 (deg 1); node 2 -> {0, 1} (deg 2); node 3 isolated
    val edges = Seq((1L, 0L), (2L, 0L), (2L, 1L)).toDF("src", "dst")
    val ranks = operators.Similarity.pageRankVarDeg(vertices, edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 0 receives 1e12/1 + 1e12/2 = 1.5e12 -> 150e9 + 1275e9
    assert(ranks(0L) == 150000000000L + 85L * 1500000000000L / 100L, ranks.toString)
    // node 1 receives 1e12/2 = 5e11 -> 150e9 + 425e9
    assert(ranks(1L) == 150000000000L + 85L * 500000000000L / 100L, ranks.toString)
    // nodes 2 and 3 receive nothing: damping floor
    assert(ranks(2L) == 150000000000L && ranks(3L) == 150000000000L, ranks.toString)
  }

  test("q96b LSH-graph centrality agrees with exact-graph centrality on a planted hub") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 40 well-separated random vectors + a 6-copy hub group: the copies
    // are mutual neighbors at cosine exactly 1.0 in BOTH graph tiers
    // (exact: 1.0 dominates; LSH: co-member edges are DETERMINISTIC via
    // digest canonicalization, no bucket luck involved), so the walk
    // must concentrate rank on the same hub members either way
    val rnd = new scala.util.Random(7)
    val base = (0 until 40).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian())))
    val hub = (0 until 6).map(i => (100L + i, base.head._2.clone()))
    val all = base.tail ++ hub // drop base.head so the hub is only the 6 copies
    val v = all.toDF("vec_id", "e")
      .withColumn("n2", functions.VectorOps.norm2(col("e")))
    val vertices = all.map(_._1).toDF("vec_id")

    // exact 3-NN edges, brute-forced driver-side (47 vectors)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val exactEdges = all.flatMap { case (id, e) =>
      all.filter(_._1 != id)
        .map { case (nid, ne) => (nid, cos(e, ne)) }
        .sortBy { case (nid, c) => (-c, nid) }
        .take(3).map { case (nid, _) => (id, nid) }
    }.toDF("src", "dst")
    val lshEdges = operators.Similarity.approxKnnGraph(v)
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"))

    def top3(edges: org.apache.spark.sql.DataFrame): Seq[Long] =
      operators.Similarity.pageRankVarDeg(vertices, edges, iters = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy { case (id, pr) => (-pr, id) }.take(3).map(_._1).toSeq
    val exactTop = top3(exactEdges)
    val lshTop = top3(lshEdges)
    assert(exactTop == lshTop,
      s"tiers disagree on the hub: exact=$exactTop lsh=$lshTop")
    assert(exactTop.forall(id => id >= 100L && id < 106L),
      s"top-3 not in the planted hub group: $exactTop")
  }

  test("q96b emits ranked rows within rank bounds on testdata") {
    val rows = operators.Similarity.q96bKnnCentralityLsh(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val prs = rows.map(_.getLong(1))
    assert(prs.sameElements(prs.sortBy(-(_: Long))), "not rank-ordered")
    prs.foreach(p => assert(p >= 150000000000L, s"rank $p below damping floor"))
    val n = Tables.embeddings(spark, sf).count()
    prs.foreach(p => assert(p < n * 1000000000000L, s"rank $p above total mass"))
  }

  test("q96 centrality emits a full-ordered top-50 within rank bounds") {
    val rows = operators.Similarity.q96KnnCentrality(spark, sf).collect()
    assert(rows.length == 50)
    val prs = rows.map(_.getLong(1))
    assert(prs.sameElements(prs.sortBy(-_)), "not rank-ordered")
    prs.foreach(p => assert(p >= 150000000000L, s"rank $p below damping floor"))
    val n = Tables.embeddings(spark, sf).count()
    prs.foreach(p => assert(p < n * 1000000000000L, s"rank $p above total mass"))
  }

  test("q104 RRF fusion: row-local recomputation, membership, descending order") {
    val out = graft.operators.Similarity.q104HybridRrf(spark, sf).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val (lex, vec, rrf) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val exp = (if (lex > 0) 1000000000L / (60 + lex) else 0L) +
        (if (vec > 0) 1000000000L / (60 + vec) else 0L)
      assert(rrf == exp, s"rrf not reciprocal-rank arithmetic for ${r.getLong(0)}")
      assert(lex > 0 || vec > 0, "fused doc in neither source list")
      assert(r.getLong(0) != 0L, "query vector leaked into results")
    }
    val scores = out.map(_.getLong(3))
    assert(scores.sameElements(scores.sortBy(-_)), "not rrf-descending")
  }

  test("q106 eval: complete sample, internal arithmetic, q50/q54 lockstep") {
    val rows = operators.Similarity.q106RetrievalEval(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(rows.length == (0L until n).count(_ % 31 == 0),
      "eval must report every sampled query, hits or not")
    rows.foreach { r =>
      val (qid, hits, nnRank, recall, rr) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(qid % 31 == 0, s"off-sample qid $qid")
      assert(hits >= 0 && hits <= 10 && nnRank >= 0 && nnRank <= 10)
      assert(recall == hits * 100000L, s"recall_ppm drift at $qid")
      assert(rr == (if (nnRank > 0) 1000000L / nnRank else 0L),
        s"rr_ppm drift at $qid")
    }
    // qid 0 is in the sample and its truth/system lists are exactly the
    // gated q50/q54 queries (same query vector, same self-exclusion) —
    // the eval must agree with their intersection
    val exact = operators.Similarity.q50KnnBrute(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val quant = operators.Similarity.q54KnnQuantized(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val row0 = rows.find(_.getLong(0) == 0L).get
    assert(row0.getLong(1) == (exact & quant).size.toLong,
      s"q106 row for qid 0 disagrees with |q50 ∩ q54|")
    // 8-bit quantization must preserve ranking well in aggregate
    val meanRecall = rows.map(_.getLong(3)).sum / rows.length
    assert(meanRecall >= 500000L, s"mean recall@10 only $meanRecall ppm")
  }

  test("q106 modulus knob: nested samples, identical rows for shared queries") {
    // 62 = 2 * 31, so the coarser sample is a strict subset of the gated
    // tier's — and because the eval is per-query independent, every
    // shared query must get the IDENTICAL row: the knob changes
    // coverage, never semantics
    val fine = operators.Similarity.retrievalEval(spark, sf, modulus = 31)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val coarse = operators.Similarity.retrievalEval(spark, sf, modulus = 62)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(coarse.nonEmpty && coarse.size < fine.size)
    assert(coarse.keySet.subsetOf(fine.keySet), "samples not nested")
    coarse.foreach { case (qid, row) =>
      assert(fine(qid) == row, s"qid $qid drifted across moduli")
    }
  }
}
