package graft

import graft.functions.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  /** Driver-side mirror of TextOps.shingles3: docs under 3 tokens have
    * NO shingles (sliding(3) alone would emit one short window there,
    * silently diverging from the pipeline on degenerate docs). */
  private def shingleSet(text: String): Set[String] = {
    val toks = text.split(' ')
    if (toks.length < 3) Set.empty
    else toks.sliding(3).map(_.mkString(" ")).toSet
  }

  /** Naive reference: all-pairs Jaccard on the driver (sf0.001 is small). */
  private def naivePairs(threshold: Double): Set[(Long, Long)] = {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), lower(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> shingleSet(r.getString(1)))
    (for {
      (ia, sa) <- docs; (ib, sb) <- docs if ia < ib
      inter = (sa & sb).size
      denom = sa.size + sb.size - inter
      if denom > 0
      jac = inter.toDouble / denom
      if jac >= threshold
    } yield (ia, ib)).toSet
  }

  test("q41 prefix-filtered pairs equal naive all-pairs Jaccard (losslessness)") {
    val got = operators.Dedup.q41DedupNgramJaccard(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naivePairs(0.6), "PPJoin prefix filter lost or invented pairs")
    assert(got.nonEmpty, "no near-dup pairs at sf0.001 — spec is vacuous")
  }

  test("q42 minhash-LSH recovers the exact near-dup pairs") {
    val exact = naivePairs(0.6)
    val lsh = operators.Dedup.q42DedupMinhashLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"LSH diverged: missing=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("q45 driver union-find and distributed label propagation agree") {
    val driver = operators.Dedup.dupClusters(spark, sf, Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dist = operators.Dedup.dupClusters(spark, sf, -1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(driver == dist, "hybrid CC paths diverge")
    assert(driver.exists { case (d, c) => d != c }, "no clusters found — vacuous")

    // lineage cap: with the checkpoint cadence forced to EVERY round,
    // the returned plan must be bounded (labels is a LogicalRDD plus the
    // final presentation join) — not a chain growing with propagation
    // rounds — and the answer must be unchanged by the truncation
    val capped = operators.Dedup.dupClusters(spark, sf, -1L, checkpointEvery = 1)
    val cappedRows = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cappedRows == driver, "checkpointed propagation changed the answer")
    val nodes = capped.queryExecution.optimizedPlan.collect { case p => p }.size
    assert(nodes < 40, s"plan not truncated by localCheckpoint: $nodes nodes")
  }

  test("digest canonicalization is lossless on a replay-duplicated corpus") {
    // Replicate a slice of the corpus 3x (distinct ids, identical text —
    // the re-ingest regime the canonicalization exists for) and check
    // q41/q42 against brute-force all-pairs jaccard over the FULL
    // member-level corpus: cross-group pairs must expand to every member
    // combination and within-group pairs must appear with jac = 1.0.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dedup_rep").toFile
    dir.deleteOnExit()
    val slice = Tables.documents(spark, sf).limit(100)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    slice.crossJoin(Seq(0L, 1L, 2L).toDF("rep"))
      .withColumn("doc_id", col("doc_id") + col("rep") * 1000000L)
      .drop("rep")
      .write.mode("overwrite").parquet(dir.getAbsolutePath + "/documents.parquet")

    val docs = spark.read.parquet(dir.getAbsolutePath + "/documents.parquet")
      .select(col("doc_id"), lower(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> shingleSet(r.getString(1)))
    val expected = (for {
      (ia, sa) <- docs; (ib, sb) <- docs if ia < ib
      inter = (sa & sb).size
      denom = sa.size + sb.size - inter
      if denom > 0
      jac = inter.toDouble / denom
      if jac >= 0.6
    } yield (ia, ib)).toSet
    assert(expected.exists { case (a, b) => b - a == 1000000L },
      "replication produced no within-group pairs — vacuous")

    for ((name, fn) <- Seq(
        "q41" -> operators.Dedup.q41DedupNgramJaccard _,
        "q42" -> operators.Dedup.q42DedupMinhashLsh _)) {
      val got = fn(spark, dir.getAbsolutePath)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected,
        s"$name on duplicated corpus: missing=${expected -- got} extra=${got -- expected}")
    }
  }

  /** Driver-side all-pairs simhash filter at `bits` width over the SAME
    * mixed 64-bit token hashes the pipeline uses — the independent
    * recomputation the banded pipelines must match to pin the
    * pigeonhole-completeness claim. The token hashes come from Spark
    * (TextOps.tokenHashes64 is itself oracle-twinned in the q43 DuckDB
    * SQL); the simhash FOLD and the all-pairs hamming filter are
    * recomputed here in plain Scala. */
  private def bruteSimhashPairs(bits: Int): Set[(Long, Long)] = {
    val th = Tables.documents(spark, sf)
      .select(col("doc_id"),
        TextOps.tokenHashes64(TextOps.toks(lower(col("text")))).as("th"))
    val sims = th.select(col("doc_id"), col("th")).collect().map { r =>
      val hs = r.getSeq[Long](1)
      var sim = 0L
      for (b <- 0 until bits) {
        val s = hs.map(h => if (((h >> b) & 1L) == 1L) 1 else -1).sum
        if (s >= 0) sim |= (1L << b)
      }
      r.getLong(0) -> sim
    }
    (for {
      (ia, sa) <- sims; (ib, sb) <- sims if ia < ib
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
  }

  test("q43 banded 64-bit simhash candidates equal the all-pairs hamming filter") {
    val got = operators.Dedup.q43DedupSimhash(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == bruteSimhashPairs(64))
    assert(got.nonEmpty, "no simhash near-dups at sf0.001 — spec is vacuous")
  }

  test("the narrower 48-bit/4-band config is also pigeonhole-complete") {
    // completeness is width-independent (pigeonhole needs only
    // bands > maxHamming); pin it for a second width so the band
    // slicing, not the specific 64-bit layout, carries the guarantee
    val got = operators.Dedup.simhashPairs(spark, sf, bits = 48, bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == bruteSimhashPairs(48))
  }

  test("tokenHashes64 leaves no dead band bits except the contracted bit 63") {
    // the point of the mix over polyHash61: at 64 bits, every band must
    // actually discriminate — across the corpus's token hashes, each of
    // the 64 bit positions except bit 63 (kept clear so the DuckDB twin
    // never shifts into the sign bit; band 3 is rank 15 by contract)
    // must take both values
    val hs = Tables.documents(spark, sf)
      .select(explode(TextOps.tokenHashes64(
        TextOps.toks(lower(col("text"))))).as("h"))
      .collect().map(_.getLong(0))
    val ones = (0 until 64).map(b => hs.count(h => ((h >> b) & 1L) == 1L))
    (0 until 63).foreach { b =>
      assert(ones(b) > 0 && ones(b) < hs.length, s"bit $b is dead across the corpus")
    }
    assert(ones(63) == 0, "bit 63 must stay clear (DuckDB shift-overflow contract)")
  }

  test("q69 incremental probe equals naive cross-pairs Jaccard (losslessness)") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), lower(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> shingleSet(r.getString(1)))
    val naive = (for {
      (ia, sa) <- docs if ia % 10 == 0
      (ib, sb) <- docs if ib % 10 != 0
      inter = (sa & sb).size
      denom = sa.size + sb.size - inter
      if denom > 0 && inter.toDouble / denom >= 0.6
    } yield (ia, ib)).toSet
    val got = operators.Dedup.q69IncrementalNeardup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive, s"missing=${naive -- got} extra=${got -- naive}")
    assert(got.nonEmpty, "no cross near-dups at sf0.001 — spec is vacuous")
  }

  test("q66b bloom tier never under-counts the exact overlap (no false negatives)") {
    val exact = operators.Dedup.q66NgramDecontam(spark, sf)
      .select(col("doc_id"), col("n_overlap"), col("contaminated"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val bloom = operators.Dedup.q66bDecontamBloom(spark, sf)
      .select(col("doc_id"), col("n_maybe_overlap"), col("flagged"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(bloom.keySet == exact.keySet,
      "bloom tier covers a different val-doc set than the exact tier")
    for ((id, (nExact, contaminated)) <- exact) {
      val (nMaybe, flagged) = bloom(id)
      assert(nMaybe >= nExact, s"doc $id: bloom counted $nMaybe < exact $nExact")
      if (contaminated) assert(flagged, s"doc $id: contaminated but not flagged")
    }
    assert(exact.values.exists(_._2), "no contaminated docs at sf0.001 — spec is vacuous")
  }

  test("q87 semantic decontamination flags a planted cross-split near-dup; clean vals pass") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 20 train vectors, 3 val vectors; val 100 is a jittered copy of
    // train 0 (cos ~1 — leaked), vals 101/102 are fresh noise (clean)
    val train = (0 until 20).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian()), "train"))
    val leaked = (100L, train.head._2.map(x => x + rnd.nextGaussian() * 0.01), "val")
    val clean = Seq(101L, 102L).map(id =>
      (id, Array.fill(64)(rnd.nextGaussian()), "val"))
    val tagged = (train ++ Seq(leaked) ++ clean).toDF("vec_id", "e", "split")
      .withColumn("n2", functions.VectorOps.norm2(col("e")))
    val out = operators.Dedup.semanticDecontamTagged(tagged).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(out.keySet == Set(100L, 101L, 102L), "every val vector must appear")
    assert(out(100L)._3 && out(100L)._1 >= 1 && out(100L)._2 > 0.9,
      s"leaked val not flagged: ${out(100L)}")
    // 64-dim gaussian noise pairs sit near cos 0 — far under the 0.4 bar
    Seq(101L, 102L).foreach { id =>
      assert(!out(id)._3 && out(id)._1 == 0 && out(id)._2 == -2.0,
        s"clean val $id misflagged: ${out(id)}")
    }
  }

  test("q87b LSH semantic decontamination flags planted leaks; flagged is a subset of exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 30 train vectors; val 100 = jittered copy of train 0 (paraphrase
    // leak, cos ~1), val 101 = EXACT copy of train 1 (the within-group
    // path: split crosses a content group), vals 102/103 = fresh noise
    val train = (0 until 30).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian()), "train"))
    val leakNear = (100L, train.head._2.map(x => x + rnd.nextGaussian() * 0.01), "val")
    val leakExact = (101L, train(1)._2.clone(), "val")
    val clean = Seq(102L, 103L).map(id =>
      (id, Array.fill(64)(rnd.nextGaussian()), "val"))
    val tagged = (train ++ Seq(leakNear, leakExact) ++ clean)
      .toDF("vec_id", "e", "split")
      .withColumn("n2", functions.VectorOps.norm2(col("e")))
    val got = operators.Dedup.semanticDecontamLsh(tagged).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(got.keySet == Set(100L, 101L, 102L, 103L), "every val vector must appear")
    assert(got(100L)._3 && got(100L)._2 > 0.9,
      s"planted near-dup leak not flagged: ${got(100L)}")
    assert(got(101L)._3 && got(101L)._1 >= 1,
      s"exact-copy leak not flagged: ${got(101L)}")
    Seq(102L, 103L).foreach { id =>
      assert(!got(id)._3 && got(id)._1 == 0 && got(id)._2 == -2.0,
        s"clean val $id misflagged: ${got(id)}")
    }
    // precision side of the contract: the LSH tier never invents
    // contamination — per val vector it counts at most the exact tier's
    // near-train count, and its max_cos is BIT-IDENTICAL to the exact
    // tier's whenever the max pair was found (within-group pairs use the
    // exact tier's float formulation, not lit(1.0)) and never above it
    val exact = operators.Dedup.semanticDecontamTagged(tagged).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(exact.keySet == got.keySet)
    assert(got(101L)._2 == exact(101L)._2,
      s"exact-copy max_cos diverged between tiers: " +
        s"lsh ${got(101L)._2} vs exact ${exact(101L)._2}")
    got.foreach { case (id, (n, mc, flagged)) =>
      assert(n <= exact(id)._1, s"val $id: LSH counted $n > exact ${exact(id)._1}")
      if (flagged) {
        assert(exact(id)._3, s"val $id flagged by LSH but clean in exact tier")
        assert(mc <= exact(id)._2,
          s"val $id: LSH max_cos $mc exceeds exact ${exact(id)._2}")
      }
    }
  }

  test("q87b group-level aggregation: replicated groups count every member pair") {
    // The r18 rewrite aggregates the report at GROUP level (n_train per
    // group) instead of exploding member pairs. This pins the count law
    // it must preserve on a corpus with REPLICATED content groups:
    // group G1 = 3 train + 2 val exact copies, group G2 = 2 train exact
    // copies of a near-dup of G1's vector. Every G1 val member must
    // count 3 within-group train copies + 2 cross-group train copies,
    // with max_cos = the exact tier's value for the same corpus.
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val base = Array.fill(64)(rnd.nextGaussian())
    val near = base.map(x => x + rnd.nextGaussian() * 0.01)
    val g1 = Seq((1L, "train"), (2L, "train"), (3L, "train"), (10L, "val"),
      (11L, "val")).map { case (id, sp) => (id, base.clone(), sp) }
    val g2 = Seq((20L, "train"), (21L, "train")).map { case (id, sp) =>
      (id, near.clone(), sp) }
    // background noise so the LSH tables have something to bucket
    val noise = (100 until 130).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian()),
        if (i % 2 == 0) "train" else "val"))
    val tagged = (g1 ++ g2 ++ noise).toDF("vec_id", "e", "split")
      .withColumn("n2", functions.VectorOps.norm2(col("e")))
    val got = operators.Dedup.semanticDecontamLsh(tagged).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    val exact = operators.Dedup.semanticDecontamTagged(tagged).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    Seq(10L, 11L).foreach { id =>
      assert(got(id)._1 == 5L,
        s"val $id: expected 3 within + 2 cross train hits, got ${got(id)._1}")
      assert(got(id) == exact(id),
        s"val $id diverged from exact tier: lsh ${got(id)} vs ${exact(id)}")
    }
    // subset-of-exact still holds corpus-wide
    got.foreach { case (id, (n, mc, flagged)) =>
      assert(n <= exact(id)._1, s"val $id: LSH counted $n > exact ${exact(id)._1}")
      if (flagged) assert(mc <= exact(id)._2)
    }
  }

  test("q44b LSH embedding near-dup retrieves planted near-dups with exact precision") {
    // the scale tier's contract (the q52b regime): true near-dups
    // (cos ~1) surface through the bucketed candidate join w.p. ~1, and
    // every emitted pair is exact — rescoring IS the exact cosine
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val base = (0 until 60).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian())))
    val planted = base.take(8).map { case (id, e) =>
      (1000L + id, e.map(x => x + rnd.nextGaussian() * 0.01)) }
    // exact replicas exercise the digest-canonicalization path: they must
    // pair with their original at cos exactly 1.0 AND inherit the
    // original's near-dup pairs through member expansion
    val copies = base.take(3).map { case (id, e) => (2000L + id, e.clone()) }
    val v = (base ++ planted ++ copies).toDF("vec_id", "e")
      .withColumn("n2", functions.VectorOps.norm2(col("e")))
    val got = operators.Dedup.embeddingNeardupLsh(v).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    (0 until 8).foreach { i =>
      assert(got.exists(p => p._1 == i && p._2 == 1000L + i),
        s"planted near-dup pair ($i, ${1000 + i}) missing")
    }
    (0 until 3).foreach { i =>
      // the within-group cosine is the EXACT TIER'S float formulation
      // n2/(sqrt(n2)*sqrt(n2)) — ~1 ulp under 1.0, bit-identical to what
      // q44 emits for the same pair (not a rounded-up lit(1.0))
      val n2 = base(i)._2.map(x => x * x).sum
      val expCos = n2 / (math.sqrt(n2) * math.sqrt(n2))
      assert(got.exists(p => p._1 == i && p._2 == 2000L + i && p._3 == expCos),
        s"exact-copy pair ($i, ${2000 + i}) missing or cos != exact-tier $expCos")
      assert(got.exists(p => p._1 == 1000L + i && p._2 == 2000L + i),
        s"copy ${2000 + i} did not inherit pair with ${1000 + i}")
    }
    // precision 1 + canonical order: recompute each emitted pair exactly
    val byId = (base ++ planted ++ copies).toMap
    got.foreach { case (a, b, cos) =>
      assert(a < b, s"pair ($a, $b) not canonical")
      val (ea, eb) = (byId(a), byId(b))
      val dot = ea.zip(eb).map { case (x, y) => x * y }.sum
      val exact = dot / (math.sqrt(ea.map(x => x * x).sum) *
        math.sqrt(eb.map(x => x * x).sum))
      assert(math.abs(exact - cos) < 1e-9, s"pair ($a, $b) cos drifted")
      assert(cos >= 0.4 - 1e-12, s"pair ($a, $b) below threshold: $cos")
    }
  }

  test("q91 duplicated-span coverage: interval union telescopes exactly; non-vacuous") {
    val rows = operators.Dedup.q91DupSpans(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    // every doc with tokens appears; coverage bounded by doc length
    assert(rows.nonEmpty)
    rows.foreach { case (id, (n, spans, cov, frac)) =>
      assert(cov <= n, s"doc $id covered $cov > $n tokens")
      assert((spans == 0) == (cov == 0), s"doc $id span/coverage disagree")
      assert(math.abs(frac - cov.toDouble / n) < 1e-15, s"doc $id frac drifted")
      // a single span covers w tokens; k spans cover at most k*w
      assert(cov <= spans * 5, s"doc $id covered $cov from $spans spans")
      // ...and at least w when any span fired (the union can't shrink
      // below one window)
      if (spans > 0) assert(cov >= 5, s"doc $id covered $cov < one window")
    }
    // the near-dup corpus (q41 finds pairs at this sf) must surface
    // SOME duplicated spans, else the gate is vacuous
    assert(rows.values.exists(_._2 > 0), "no duplicated spans at sf0.001")
    // driver reference on a planted mini-corpus: overlapping dup spans
    // in one doc telescope to the exact union, not w per span
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),   // spans at 1..4 all duplicated in doc 2
      (2L, "a b c d e f g h z"),
      (3L, "p q r s t u v w")    // unique: zero coverage
    ).toDF("doc_id", "text")
    val got = operators.Dedup.dupSpansFrom(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1: 8 tokens, 4 span starts (1-4) all duplicated; union covers
    // tokens 1..8 = 8, NOT 4*5 = 20
    assert(got(1L) == ((8L, 4L, 8L)), s"doc1 ${got(1L)}")
    assert(got(2L) == ((9L, 4L, 8L)), s"doc2 ${got(2L)}")
    assert(got(3L) == ((8L, 0L, 0L)), s"doc3 ${got(3L)}")
  }

  test("repeated LSH-tier runs do not grow persisted storage (FrameCache audit)") {
    // the round-7 ADVICE leak, generalized: every dedup/ANN intermediate
    // persists through FrameCache now, so back-to-back runs of the
    // persist-heavy tiers must reuse entries, not register new ones
    def runAll(): Unit = Seq(
      operators.Dedup.q44bDedupEmbeddingLsh(spark, sf),
      operators.Dedup.q87bSemanticDecontamLsh(spark, sf),
      operators.Similarity.q73bKnnGraphLsh(spark, sf),
      operators.Dedup.q41DedupNgramJaccard(spark, sf),
      operators.Dedup.q66bDecontamBloom(spark, sf)
    ).foreach(_.collect())
    runAll()
    val after1 = spark.sparkContext.getPersistentRDDs.size
    val cache1 = FrameCache.size
    runAll()
    val after2 = spark.sparkContext.getPersistentRDDs.size
    val cache2 = FrameCache.size
    assert(after2 <= after1,
      s"persistent RDD count grew across identical runs: $after1 -> $after2")
    assert(cache2 == cache1,
      s"FrameCache entry count changed across identical runs: $cache1 -> $cache2")
  }

  test("FrameCache rebuilds cleared entries so nested caches stay live") {
    // the round-11 sf1-bench find: after a harness clearCache, a HIT on
    // an outer entry used to return the memoized Dataset — whose plan
    // was compiled against the now-cleared InMemoryRelations of NESTED
    // entries — so the nested pipeline evaluated uncached inside every
    // materialization (q45 measured 49 s vs 3 s at 10x). The contract
    // now: an access to a cleared entry REBUILDS it, re-entering
    // persisted() for nested entries, so both end up re-registered.
    import org.apache.spark.sql.functions.col
    import org.apache.spark.storage.StorageLevel
    def inner = FrameCache.persisted(spark, "fcclear:inner")(
      spark.range(100).toDF("id"))
    def outer = FrameCache.persisted(spark, "fcclear:outer")(
      inner.select((col("id") * 2).as("x")))
    outer.count()
    spark.catalog.clearCache()
    val rebuilt = outer // hit path with cleared storage -> rebuild
    rebuilt.count()
    assert(rebuilt.storageLevel != StorageLevel.NONE,
      "outer entry not re-persisted after clearCache")
    // the nested entry was re-registered by the rebuild: a fresh access
    // must be a LIVE hit (builder must not run again)
    val innerHit = FrameCache.persisted(spark, "fcclear:inner")(
      fail("inner rebuilt on what should be a live hit"))
    assert(innerHit.storageLevel != StorageLevel.NONE,
      "nested entry left uncached after the outer rebuild")
  }

  test("q97 source-overlap matrix is dense, exact, and de-duplicates within source") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q97_docs").toFile
    dir.deleteOnExit()
    Seq(
      (1L, "shared mirror text", "cc", "en", 18L),
      (2L, "shared mirror text", "c4", "en", 18L),   // cc∩c4 content
      (3L, "shared mirror text", "c4", "en", 18L),   // in-source copy: still 1 distinct
      (4L, "only in cc", "cc", "en", 10L),
      (5L, "only in c4", "c4", "en", 10L),
      (6L, "wiki only", "wiki", "en", 9L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(dir.getAbsolutePath + "/documents.parquet")
    val rows = operators.Dedup.q97SourceOverlap(spark, dir.getAbsolutePath)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // dense upper triangle over {c4, cc, wiki}
    assert(rows.keySet == Set(("c4", "cc"), ("c4", "wiki"), ("cc", "wiki")))
    assert(rows(("c4", "cc")) == ((1L, 2L, 2L)), rows.toString)   // one shared content
    assert(rows(("c4", "wiki")) == ((0L, 2L, 1L)), rows.toString) // checked, clean
    assert(rows(("cc", "wiki")) == ((0L, 2L, 1L)), rows.toString)
  }
}
