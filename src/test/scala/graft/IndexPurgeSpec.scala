package graft

import graft.sources.{AnnIndexStore, IndexTombstones, InvertedIndexStore,
  KnnGraphStore, VersionedStore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws of serving-store erasure (round-15 verdict #1): a purged key is
  * unservable through every probe the moment the tombstone lands; the
  * purged index's answers are BIT-IDENTICAL to an index rebuilt over
  * the surviving corpus (stats adjust exactly, replays never
  * double-subtract); the physical fold rewrites only bloom-admitted
  * files and leaves no purged key's bytes in ANY file of ANY relation
  * (the unrecoverability law, extended from the versioned store). */
class IndexPurgeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_purge_$tag").toString + "/ix"

  // deterministic corpus carrying the fixed Bm25Query terms
  private def docText(i: Long): String =
    (Seq.fill((i % 5 + 1).toInt)("spark") ++
      Seq.fill((i % 3).toInt)("query") ++
      Seq.fill((i % 7 % 3).toInt)("hash") ++
      Seq.fill((i % 4 + 2).toInt)(s"filler$i")).mkString(" ")

  private def docs(n: Long) =
    (1L to n).map(i => (i, docText(i))).toDF("doc_id", "text")

  private val purged: Seq[Long] = (1L to 60L).filter(_ % 10 == 7)

  private def bm25Rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("inverted index: purge is immediate, survivor-rebuild-exact, " +
      "idempotent, and covers the phrase tier") {
    val pathA = tmp("inv_a")
    InvertedIndexStore.build(docs(60), pathA, files = 8)
    InvertedIndexStore.purge(spark, pathA, purged)
    val probeA = bm25Rows(InvertedIndexStore.bm25Probe(spark, pathA))
    assert(probeA.nonEmpty && probeA.forall(t => !purged.contains(t._1)),
      s"purged doc served: $probeA")
    // THE stats law: bit-identical to an index built over survivors
    val pathB = tmp("inv_b")
    InvertedIndexStore.build(
      docs(60).filter(!col("doc_id").isin(purged: _*)), pathB, files = 8)
    val probeB = bm25Rows(InvertedIndexStore.bm25Probe(spark, pathB))
    assert(probeA == probeB,
      s"purged probe != survivor rebuild:\n  A=$probeA\n  B=$probeB")
    // replayed + absent-id purges change nothing (no double-subtract)
    InvertedIndexStore.purge(spark, pathA, purged ++ Seq(9999L))
    assert(bm25Rows(InvertedIndexStore.bm25Probe(spark, pathA)) == probeA,
      "a replayed purge moved the scores — stats double-subtracted")
    // the phrase/boolean tier excludes purged docs too
    val pos = IndexTombstones.minus(spark, pathA,
      spark.read.parquet(InvertedIndexStore.posPath(pathA)), "doc_id")
    val phrase = InvertedIndexStore.booleanPhrase(pos,
      operators.Text.Bm25Query)
    assert(phrase.filter(col("doc_id").isin(purged: _*)).count() == 0)
  }

  test("inverted index: fold is physical, bloom-pruned, and " +
      "probe-invariant; tombstones clear") {
    val path = tmp("inv_fold")
    InvertedIndexStore.build(docs(60), path, files = 8)
    // ONE purged doc: its rows live in few files, so the doc_id blooms
    // must keep the rewrite set well under the file count
    val one = Seq(37L)
    InvertedIndexStore.purge(spark, path, one)
    val before = bm25Rows(InvertedIndexStore.bm25Probe(spark, path))
    val totalFiles =
      VersionedStore.hadoopLs(spark, path).size +
      VersionedStore.hadoopLs(spark, InvertedIndexStore.posPath(path)).size +
      VersionedStore.hadoopLs(spark, InvertedIndexStore.doclensPath(path)).size
    val rewritten = InvertedIndexStore.fold(spark, path)
    assert(rewritten > 0 && rewritten < totalFiles,
      s"fold rewrote $rewritten of $totalFiles files — blooms pruned nothing")
    assert(!IndexTombstones.exists(spark, path), "tombstones survived fold")
    assert(bm25Rows(InvertedIndexStore.bm25Probe(spark, path)) == before,
      "fold changed the probe's answer")
    // unrecoverability: no file of any relation holds the purged doc
    Seq(path, InvertedIndexStore.posPath(path),
        InvertedIndexStore.doclensPath(path)).foreach { rel =>
      val hit = spark.read.parquet(rel)
        .filter(col("doc_id").isin(one: _*)).count()
      assert(hit == 0, s"purged doc recoverable from $rel")
    }
    // manifests stay consistent: every listed file exists, every data
    // file is listed (the fold's incremental manifest refresh)
    Seq(path -> InvertedIndexStore.manifestPath(path),
        InvertedIndexStore.posPath(path) ->
          InvertedIndexStore.posManifestPath(path),
        InvertedIndexStore.doclensPath(path) ->
          InvertedIndexStore.doclensManifestPath(path)).foreach {
      case (rel, mf) =>
        val listed = spark.read.parquet(mf)
          .select("file").as[String].collect().toSet
        assert(listed == VersionedStore.hadoopLs(spark, rel),
          s"manifest of $rel diverged from the directory")
    }
    // a second fold with nothing tombstoned is a no-op
    assert(InvertedIndexStore.fold(spark, path) == 0)
    // a LATER purge folds again — completed folds' output names must
    // not collide with the new attempt (the attempt counter survives
    // stage-dir cleanup)
    InvertedIndexStore.purge(spark, path, Seq(12L))
    assert(InvertedIndexStore.fold(spark, path) > 0)
    assert(spark.read.parquet(path).filter(col("doc_id") === 12L).count() == 0)
  }

  // deterministic unit-ish vectors, vec 0 = the query
  private def vecs(n: Int) = (0 to n).map { i =>
    val e = Seq(math.sin(i * 1.3), math.cos(i * 0.7),
      math.sin(i * 2.1 + 1), math.cos(i * 1.9 + 2))
    (i.toLong, e, e.map(x => x * x).sum)
  }.toDF("vec_id", "e", "n2")

  private def exactTop(n: Int, dead: Set[Long], k: Int): Seq[Long] = {
    def e(i: Int) = Array(math.sin(i * 1.3), math.cos(i * 0.7),
      math.sin(i * 2.1 + 1), math.cos(i * 1.9 + 2))
    val q = e(0)
    val qn = math.sqrt(q.map(x => x * x).sum)
    (1 to n).filterNot(i => dead(i.toLong)).map { i =>
      val v = e(i)
      val cos = v.zip(q).map(t => t._1 * t._2).sum /
        (math.sqrt(v.map(x => x * x).sum) * qn)
      (i.toLong, cos)
    }.sortBy(t => (-t._2, t._1)).take(k).map(_._1)
  }

  test("ann store: purge excludes every tier; probe-all IVF equals the " +
      "exact scan over survivors; fold is physical and probe-invariant") {
    val path = tmp("ann")
    val n = 48
    AnnIndexStore.build(vecs(n), path)
    // purge the exact top-2 neighbors plus three others
    val top = exactTop(n, Set.empty, 2)
    val dead = (top ++ Seq(11L, 23L, 31L)).distinct.sorted
    AnnIndexStore.purge(spark, path, dead)
    val qe = Array(math.sin(0.0), math.cos(0.0), math.sin(1.0), math.cos(2.0))
    val cells = spark.read.parquet(AnnIndexStore.centroidsPath(path))
      .count().toInt
    // nprobe = cells ≡ the exact scan — over SURVIVORS only
    val ivf = AnnIndexStore.ivfProbeVector(spark, path, qe, cells, 10,
      excludeId = Some(0L)).select("vec_id").as[Long].collect().toSeq
    assert(ivf == exactTop(n, dead.toSet, 10),
      s"probe-all IVF over the purged store != exact survivor scan: $ivf")
    // the LSH tier serves no purged vector
    val lsh = AnnIndexStore.lshProbe(spark, path)
      .select("vec_id").as[Long].collect().toSeq
    assert(lsh.nonEmpty && lsh.forall(v => !dead.contains(v)))
    // the quantized tier == its own brute ranking minus the purged ids
    def quantRank(): Seq[Long] = {
      val qq = spark.read.parquet(AnnIndexStore.quantPath(path))
        .filter(col("vec_id") === 0)
        .select(col("q").as("cq"), col("qn2").as("cqn2"))
      spark.read.parquet(AnnIndexStore.quantPath(path))
        .filter(col("vec_id") =!= 0).crossJoin(broadcast(qq))
        .select(col("vec_id"),
          when(col("qn2") === 0 || col("cqn2") === 0, lit(-2.0))
            .otherwise(operators.Similarity.intDotCol(col("q"), col("cq"))
              .cast("double") / (sqrt(col("qn2").cast("double"))
                * sqrt(col("cqn2").cast("double")))).as("qcos"))
        .orderBy(col("qcos").desc, col("vec_id"))
        .select("vec_id").as[Long].collect().toSeq
    }
    val quantExpected = quantRank().filterNot(dead.contains).take(10)
    val quant = AnnIndexStore.quantizedProbe(spark, path)
      .select("vec_id").as[Long].collect().toSeq
    assert(quant == quantExpected, s"quantized probe: $quant != $quantExpected")
    // FOLD: physical, probe-invariant, unrecoverable
    val folded = AnnIndexStore.fold(spark, path)
    assert(folded > 0)
    assert(!IndexTombstones.exists(spark, path))
    assert(AnnIndexStore.ivfProbeVector(spark, path, qe, cells, 10,
      excludeId = Some(0L)).select("vec_id").as[Long].collect().toSeq == ivf)
    assert(AnnIndexStore.quantizedProbe(spark, path)
      .select("vec_id").as[Long].collect().toSeq == quant)
    assert(AnnIndexStore.lshProbe(spark, path)
      .select("vec_id").as[Long].collect().toSeq == lsh)
    Seq(AnnIndexStore.vectorsPath(path), AnnIndexStore.codesPath(path),
        AnnIndexStore.cellsPath(path), AnnIndexStore.quantPath(path))
      .foreach { rel =>
        assert(spark.read.parquet(rel)
          .filter(col("vec_id").isin(dead: _*)).count() == 0,
          s"purged vector recoverable from $rel")
      }
  }

  test("knn graph: purge drops nodes from walk and centrality; fold " +
      "re-derives entries and leaves no purged id on either edge end") {
    val n = 256
    val ring = (1 to n).map { i =>
      val th = 2 * math.Pi * i / n
      (i.toLong, Seq(math.cos(th), math.sin(th)), 1.0)
    }.toDF("vec_id", "e", "n2")
    val path = tmp("graph")
    KnnGraphStore.buildFromVectors(spark, ring, path,
      targetFileBytes = 16L << 10)
    val qth = 2 * math.Pi * 0.37
    val score: Seq[Long] => Seq[(Long, Double)] =
      ids => ids.map(id => (id, math.cos(2 * math.Pi * id / n - qth)))
    val exactIdx = math.round(0.37 * n)
    val dead = Seq(exactIdx, exactIdx + 1, exactIdx - 1, 40L, 200L)
      .map(_.toLong).distinct.sorted
    KnnGraphStore.purge(spark, path, dead)
    val (res, _) = KnnGraphStore.probeFlat(spark, path, score,
      k = 10, beam = 8, maxHops = 96, ef = 48)
    assert(res.nonEmpty && res.forall(t => !dead.contains(t._1)),
      s"walk served a purged node: $res")
    // centrality over the purged store: no purged node ranked, and the
    // result equals the walk over the hand-filtered edge relation
    val vertices = ring.select(col("vec_id"))
    val got = KnnGraphStore.centralityOn(spark, path, vertices)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.nonEmpty && got.forall(t => !dead.contains(t._1)))
    val raw = spark.read.parquet(path)
    val kept = raw.filter(!col("src").isin(dead: _*) &&
      !col("dst").isin(dead: _*)).drop("deg")
    val want = operators.Similarity.centralityFromEdges(
      vertices.filter(!col("vec_id").isin(dead: _*)),
      kept.join(kept.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want, "tombstone-aware centrality != hand-filtered walk")
    // purging EVERY entry point fails with the fold contract...
    val entries = spark.read.parquet(KnnGraphStore.entriesPath(path))
      .head().getSeq[Long](0).distinct
    KnnGraphStore.purge(spark, path, entries)
    val ex = intercept[IllegalArgumentException] {
      KnnGraphStore.probeFlat(spark, path, score, 10, 8, 96, 48)
    }
    assert(ex.getMessage.contains("fold"))
    // ...and fold repairs it: fresh entries, working probe, clean files
    val allDead = (dead ++ entries).distinct
    assert(KnnGraphStore.fold(spark, path) > 0)
    assert(!IndexTombstones.exists(spark, path))
    val (res2, _) = KnnGraphStore.probeFlat(spark, path, score,
      k = 10, beam = 8, maxHops = 96, ef = 48)
    assert(res2.nonEmpty && res2.forall(t => !allDead.contains(t._1)))
    val meta = spark.read.parquet(KnnGraphStore.layersMetaPath(path)).head()
    val layerRels = (1 to meta.getInt(0)).map(l => KnnGraphStore.layerPath(path, l))
    (Seq(path) ++ layerRels).foreach { rel =>
      assert(spark.read.parquet(rel)
        .filter(col("src").isin(allDead: _*) ||
          col("dst").isin(allDead: _*)).count() == 0,
        s"purged node recoverable from $rel")
    }
    // folded degrees are true fan-outs again (the q96c division input)
    val badDeg = spark.read.parquet(path)
      .groupBy(col("src"), col("deg")).agg(count(lit(1)).as("c"))
      .filter(col("deg") =!= col("c")).count()
    assert(badDeg == 0, s"$badDeg nodes carry a stale post-fold degree")
  }

  test("cluster-side bloom admission folds exactly the driver-recomputed " +
      "admitted set (round-16 verdict #2)") {
    val path = tmp("inv_admit")
    InvertedIndexStore.build(docs(60), path, files = 8)
    val one = Set(37L)
    // the admitted set, recomputed DRIVER-SIDE from the raw bloom
    // relations — the reference semantics the cluster-side probe join
    // must reproduce exactly (bloom-less files fail open)
    def admitted(rel: String, mf: String): Set[String] = {
      val listed = spark.read.parquet(mf).select("file").as[String]
        .collect().map(VersionedStore.canon).toSet
      val blooms = spark.read.parquet(IndexTombstones.bloomsPath(rel))
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
      listed.filter(f => blooms.get(f) match {
        case Some(b) => one.exists(k => sources.KeyBloom.mightContain(b, k))
        case None => true
      })
    }
    val rels = Seq(
      path -> InvertedIndexStore.manifestPath(path),
      InvertedIndexStore.posPath(path) ->
        InvertedIndexStore.posManifestPath(path),
      InvertedIndexStore.doclensPath(path) ->
        InvertedIndexStore.doclensManifestPath(path))
    val want = rels.map { case (rel, mf) => admitted(rel, mf) }
    val gone = want.flatten.toSet
    InvertedIndexStore.purge(spark, path, one.toSeq)
    val rewritten = InvertedIndexStore.fold(spark, path)
    assert(rewritten == want.map(_.size).sum,
      s"fold rewrote $rewritten files, driver-side admission says " +
        s"${want.map(_.size).sum}")
    // every admitted original was deleted; every survivor kept
    rels.foreach { case (rel, _) =>
      val now = VersionedStore.hadoopLs(spark, rel)
      assert(now.intersect(gone).isEmpty,
        s"an admitted original survived the fold under $rel")
    }
  }

  test("a crashed manifest swap heals at the next fold " +
      "(round-16 verdict #5)") {
    val path = tmp("inv_crash")
    InvertedIndexStore.build(docs(60), path, files = 8)
    InvertedIndexStore.purge(spark, path, Seq(37L))
    assert(InvertedIndexStore.fold(spark, path) > 0)
    // inject the WORST swap window on the postings manifest: live copy
    // renamed out (.mold), a dead staging orphan beside it — the state
    // a crash between rename-out and rename-in leaves behind
    val mf = InvertedIndexStore.manifestPath(path)
    val p = new org.apache.hadoop.fs.Path(mf)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(p, new org.apache.hadoop.fs.Path(mf + ".mold")))
    fs.mkdirs(new org.apache.hadoop.fs.Path(mf + ".mstage"))
    // the next fold heals first, then folds the new batch
    InvertedIndexStore.purge(spark, path, Seq(12L))
    assert(InvertedIndexStore.fold(spark, path) > 0)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(mf + ".mold")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(mf + ".mstage")))
    // post-heal probe is bit-identical to a rebuild over the survivors
    val rebuilt = tmp("inv_crash_b")
    InvertedIndexStore.build(
      docs(60).filter(!col("doc_id").isin(37L, 12L)), rebuilt, files = 8)
    assert(bm25Rows(InvertedIndexStore.bm25Probe(spark, path))
      == bm25Rows(InvertedIndexStore.bm25Probe(spark, rebuilt)),
      "post-heal probe diverged from the survivor rebuild")
    assert(spark.read.parquet(mf).select("file").as[String].collect().toSet
      == VersionedStore.hadoopLs(spark, path),
      "healed manifest diverged from the directory")
  }

  test("SQL surface: CALL graft_store_purge tombstones and folds the " +
      "serving families") {
    val path = tmp("call")
    InvertedIndexStore.build(docs(60), path, files = 8)
    val r1 = GraftCatalog.call(spark,
      s"CALL graft_store_purge('inverted_index', '$path', 'doc_id', '37')")
    assert(r1.columns.toSeq == Seq("path", "folded_files"))
    assert(r1.head().getInt(1) == -1) // logical: nothing rewritten yet
    assert(IndexTombstones.keySet(spark, path) == Set(37L))
    val r2 = GraftCatalog.call(spark,
      s"CALL graft_store_purge('inverted_index', '$path', 'doc_id', " +
        "'37', 'fold')")
    assert(r2.head().getInt(1) > 0)
    assert(!IndexTombstones.exists(spark, path))
    assert(spark.read.parquet(path).filter(col("doc_id") === 37L).count() == 0)
  }
}
