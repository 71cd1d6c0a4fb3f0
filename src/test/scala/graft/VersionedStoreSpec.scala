package graft

import graft.sources.VersionedStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The versioned store's PHYSICAL contracts — the properties the
  * oracle-exact q109 gate cannot see because they live in the file
  * layout: immutability (a version's files are never modified by later
  * commits), structural sharing (an update version reuses the parent's
  * untouched files byte-for-byte), and bounded copy-on-write (only the
  * files whose key range owns updated rows are rewritten). */
class VersionedStoreSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("append shares every parent file; copy-on-write rewrites only owning files") {
    val path = VersionedStore.store(spark, dir)
    val f1 = VersionedStore.versionFiles(spark, path, 1).toSet
    val f2 = VersionedStore.versionFiles(spark, path, 2).toSet
    val f3 = VersionedStore.versionFiles(spark, path, 3).toSet
    // append commit: v2 inherits EVERY v1 file and only adds
    assert(f1.subsetOf(f2), "append must not drop or rewrite parent files")
    assert((f2 -- f1).nonEmpty, "append landed no new files")
    // copy-on-write commit: v3 shares most of v2 and both drops
    // (rewritten) and adds (rewrites) something
    val shared = f2 & f3
    val rewritten = f2 -- f3
    assert(shared.nonEmpty, "update version shares nothing with its parent")
    assert(rewritten.nonEmpty && (f3 -- f2).nonEmpty)
    assert(rewritten.size < f2.size / 2,
      s"copy-on-write rewrote ${rewritten.size} of ${f2.size} files — not bounded")
    // ...and the rewritten set is exactly the files whose key range
    // overlaps the update band (per-file stats, the q82 planning step)
    val (lo, hi) = VersionedStore.updateBand(
      spark.read.parquet(f2.toSeq: _*))
    val stats = spark.read.parquet(f2.toSeq: _*)
      .groupBy(input_file_name().as("file"))
      .agg(min(col("o_custkey")).as("mn"), max(col("o_custkey")).as("mx"))
      .collect()
      .map(r => VersionedStore.canon(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    rewritten.foreach { f =>
      val (mn, mx) = stats(f)
      assert(mx >= lo && mn <= hi,
        s"rewrote a file outside the update band: $f [$mn,$mx] vs [$lo,$hi]")
    }
    // ...and every v2 file NOT overlapping the band survives into v3
    f2.foreach { f =>
      val (mn, mx) = stats(f)
      if (!(mx >= lo && mn <= hi))
        assert(f3.contains(f), s"non-owning file dropped by the update: $f")
    }
  }

  test("old versions stay readable and bit-stable after later commits") {
    val path = VersionedStore.store(spark, dir)
    // v1 re-read AFTER v3 exists must equal the logical v1 frame exactly
    val v1 = VersionedStore.readVersion(spark, path, 1)
    val logical = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < to_timestamp(lit("1997-01-01")))
      .select(col("o_orderkey"), col("o_custkey"),
        Num.cents(col("o_totalprice")).as("amount_c"), col("o_orderdate"))
    assert(v1.count() == logical.count())
    assert(v1.except(logical).isEmpty && logical.except(v1).isEmpty,
      "v1 drifted after later commits — immutability broken")
    // v2 must NOT see v3's adjustment: its band-sum equals the raw sum
    val v2 = VersionedStore.readVersion(spark, path, 2)
    val (lo, hi) = VersionedStore.updateBand(v2)
    val v2Band = v2.filter(col("o_custkey").between(lo, hi))
      .agg(sum(col("amount_c"))).head().getLong(0)
    val v3Band = VersionedStore.readVersion(spark, path, 3)
      .filter(col("o_custkey").between(lo, hi))
      .agg(sum(col("amount_c")), count(lit(1))).head()
    assert(v3Band.getLong(0) == v2Band + 100L * v3Band.getLong(1),
      "v3 adjustment arithmetic drifted")
  }

  test("q110 maintains the view from the delta only, never rescanning v1 facts") {
    val path = VersionedStore.store(spark, dir)
    val out = VersionedStore.incrementalMv(spark, path)
    // the fact-side scan reads exactly the v1->v2 manifest diff
    val delta = VersionedStore.deltaFiles(spark, path, 1, 2).toSet
    val f1 = VersionedStore.versionFiles(spark, path, 1).toSet
    assert(delta.nonEmpty && (delta & f1).isEmpty)
    // sparkPlan, not executedPlan: AQE wraps the latter in an adaptive
    // node whose children are not visible to collect()
    val scannedFacts = out.queryExecution.sparkPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec
          if sc.relation.location.inputFiles.exists(_.contains("/data/")) =>
        sc.relation.location.inputFiles.map(VersionedStore.canon).toSet
    }
    assert(scannedFacts.nonEmpty, "no fact scan found in the plan")
    scannedFacts.foreach { files =>
      assert(files == delta,
        s"fact scan reads ${files.size} files, expected the ${delta.size}-file delta")
    }
    // incremental == full recompute (the IVM statement, also the oracle)
    val full = VersionedStore.readVersion(spark, path, 2)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("trips"), sum(col("amount_c")).as("amount_c"))
    assert(out.except(full).isEmpty && full.except(out).isEmpty,
      "incremental maintenance drifted from the full recompute")
  }

  test("q110b refreshes across the update commit from removed+added files only") {
    val path = VersionedStore.store(spark, dir)
    val out = VersionedStore.q110bIncrementalMvCow(spark, dir)
    val f2 = VersionedStore.versionFiles(spark, path, 2).toSet
    val f3 = VersionedStore.versionFiles(spark, path, 3).toSet
    val (removed, added) = (f2 -- f3, f3 -- f2)
    assert(removed.nonEmpty && added.nonEmpty,
      "v2->v3 must remove AND add files (copy-on-write)")
    // the fact-side scans read exactly removed ∪ added — the rewritten
    // band's old files (retraction) and their replacements (merge);
    // shared files are NEVER rescanned
    val scannedFacts = out.queryExecution.sparkPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec
          if sc.relation.location.inputFiles.exists(_.contains("/data/")) =>
        sc.relation.location.inputFiles.map(VersionedStore.canon).toSet
    }
    assert(scannedFacts.nonEmpty, "no fact scan found in the plan")
    assert(scannedFacts.toSet == Set(removed, added),
      s"fact scans ${scannedFacts.map(_.size)} != {removed ${removed.size}, added ${added.size}}")
    // retract-and-merge == full v3 recompute (the update-IVM statement)
    val full = VersionedStore.readVersion(spark, path, 3)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("trips"), sum(col("amount_c")).as("amount_c"))
    assert(out.except(full).isEmpty && full.except(out).isEmpty,
      "update-commit IVM drifted from the full v3 recompute")
  }

  test("vacuum expires old versions, keeps shared files, leaves retained reads bit-stable") {
    // a PRIVATE store build — vacuum mutates history, so it must not
    // touch the cached store the gated queries share
    val base = java.nio.file.Files.createTempDirectory("graft_vac_").toString
    val path = s"$base/store"
    VersionedStore.build(spark, dir, path)
    val f1 = VersionedStore.versionFiles(spark, path, 1).toSet
    val f2 = VersionedStore.versionFiles(spark, path, 2).toSet
    val f3 = VersionedStore.versionFiles(spark, path, 3).toSet
    val sharedIntoV3 = (f1 | f2) & f3
    val exclusiveToOld = (f1 | f2) -- f3 // the rewritten band owners
    assert(sharedIntoV3.nonEmpty && exclusiveToOld.nonEmpty,
      "store must have both shared and superseded files for the test to bite")
    val before = VersionedStore.readVersion(spark, path, 3)
      .agg(count(lit(1)), sum(col("amount_c"))).head()

    val (expired, deleted) = VersionedStore.vacuum(spark, path, keepVersions = 1)
    assert(expired == 2 && deleted == exclusiveToOld.size,
      s"vacuum expired $expired versions, deleted $deleted files; " +
        s"expected 2 and ${exclusiveToOld.size}")
    // superseded files physically gone; every v3-referenced file —
    // including those WRITTEN for v1 and shared forward — survives
    exclusiveToOld.foreach(f =>
      assert(!new java.io.File(f).exists, s"superseded file survived: $f"))
    f3.foreach(f =>
      assert(new java.io.File(f).exists, s"retained file deleted: $f"))
    assert(VersionedStore.versions(spark, path) == Seq(3), "manifests not expired")
    // the retained version reads the same bits as before the vacuum
    val after = VersionedStore.readVersion(spark, path, 3)
      .agg(count(lit(1)), sum(col("amount_c"))).head()
    assert(after == before, "vacuum changed the retained version's content")
    // idempotent re-run: nothing left to expire
    assert(VersionedStore.vacuum(spark, path, keepVersions = 1) == ((0, 0)))
  }

  test("reader grace: in-window expiry keeps files readable, post-window vacuum reaps them") {
    // round-14 verdict #5 — a pinned clock seam drives the window: an
    // expiry INSIDE the grace drops manifests (the version stops
    // resolving) but tombstones the files, so an in-flight reader of the
    // just-expired version finishes its scan; a vacuum AFTER the window
    // reaps them (retention semantics unchanged, just time-shifted).
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_grace_").toString + "/store"
    val dp = VersionedStore.dataPath(path)
    (1L to 500L).map(k => (k, k)).toDF("key", "amount")
      .repartitionByRange(4, col("key")).sortWithinPartitions("key")
      .write.parquet(dp)
    VersionedStore.writeManifest(spark, path, 1,
      VersionedStore.hadoopLs(spark, dp))
    // v2 = a compaction: supersedes EVERY v1 file
    VersionedStore.compactCommit(spark, path, "key", targetFileBytes = 1L << 20)
    val v1Files = VersionedStore.versionFiles(spark, path, 1).toSeq
    // the "in-flight reader": a frame planned over v1's files pre-expiry
    val inFlight = spark.read.parquet(v1Files: _*)
    var clock = 1000000L
    val (expired, deletedNow) = VersionedStore.vacuum(spark, path,
      keepVersions = 1, fileGraceMs = 60000L, nowMs = () => clock)
    assert(expired == 1 && deletedNow == 0,
      s"in-window expiry deleted $deletedNow files — grace not honored")
    // the version no longer RESOLVES, but its bytes serve the reader
    assert(VersionedStore.versions(spark, path) == Seq(2))
    assert(inFlight.count() == 500L, "in-flight read failed inside the window")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      VersionedStore.tombstonesDir(path))))
    // a second in-window vacuum still reaps nothing
    clock += 59000L
    assert(VersionedStore.vacuum(spark, path, keepVersions = 1,
      fileGraceMs = 60000L, nowMs = () => clock)._2 == 0)
    // past the window: the files reap and the tombstone goes with them
    clock += 2000L
    val (_, reaped) = VersionedStore.vacuum(spark, path, keepVersions = 1,
      fileGraceMs = 60000L, nowMs = () => clock)
    assert(reaped == v1Files.size,
      s"post-window vacuum reaped $reaped of ${v1Files.size}")
    v1Files.foreach(f => assert(
      !fs.exists(new org.apache.hadoop.fs.Path(f)), s"file survived: $f"))
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(
      VersionedStore.tombstonesDir(path))).isEmpty)
    // the retained tip is untouched throughout
    assert(VersionedStore.readVersion(spark, path, 2).count() == 500L)
  }

  test("q109 gated query: one summary row per version, monotone growth") {
    val rows = VersionedStore.q109TimeTravel(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val n = rows.map(_.getLong(1))
    assert(n(0) > 0 && n(0) < n(1) && n(1) == n(2),
      s"row counts not (grow, equal): ${n.toSeq}")
    assert(rows(2).getLong(2) > rows(1).getLong(2),
      "v3 adjustment must raise the cent sum")
  }

  test("readAsOf boundary laws: between-commit probes, inclusive stamps, monotone skew repair") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_asof_").toString + "/store"
    VersionedStore.appendCommit(spark,
      path, Seq((1L, 10L)).toDF("k", "v"), "k", 1)
    VersionedStore.appendCommit(spark,
      path, Seq((2L, 20L)).toDF("k", "v"), "k", 1)
    val times = VersionedStore.commitTimes(spark, path)
    assert(times.map(_._1) == Seq(1, 2))
    val (t1, t2) = (times.head._2, times.last._2)
    assert(t2 > t1, "adjusted commit times must be strictly increasing")
    // inclusive boundary: a probe AT a commit's stamp reads that commit
    assert(VersionedStore.readAsOf(spark, path, t1).count() == 1L)
    assert(VersionedStore.readAsOf(spark, path, t2).count() == 2L)
    // between the commits: the older version
    if (t2 - t1 > 1)
      assert(VersionedStore.readAsOf(spark, path, t1 + (t2 - t1) / 2).count() == 1L)
    // after the tip: the tip
    assert(VersionedStore.readAsOf(spark, path, t2 + 1000000L).count() == 2L)
    // before the first commit: the store did not exist — loud
    intercept[IllegalArgumentException] {
      VersionedStore.readAsOf(spark, path, t1 - 1)
    }
  }

  test("schema evolution: add-column commit rewrites nothing; both reader directions hold") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_evo_").toString + "/store"
    VersionedStore.appendCommit(spark,
      path, (1L to 50L).map(k => (k, k * 2)).toDF("k", "v"), "k", 2)
    val f1 = VersionedStore.versionFiles(spark, path, 1).toSet
    VersionedStore.appendCommit(spark,
      path, (51L to 60L).map(k => (k, k * 2, s"tag$k")).toDF("k", "v", "tag"),
      "k", 1)
    // the add-column commit shares every v1 file (no rewrite)
    val f2 = VersionedStore.versionFiles(spark, path, 2).toSet
    assert(f1.subsetOf(f2))
    // new reader, old+new data: merged schema null-fills old rows
    val merged = VersionedStore.readVersionMerged(spark, path, 2)
    assert(merged.columns.toSet == Set("k", "v", "tag"))
    assert(merged.filter(col("tag").isNull).count() == 50L)
    assert(merged.filter(col("tag").isNotNull).count() == 10L)
    // old reader, new data: projecting only the original columns still
    // reads every row (the column-pruned scan ignores the new column)
    val oldView = spark.read.option("mergeSchema", "true")
      .parquet(VersionedStore.versionFiles(spark, path, 2): _*)
      .select("k", "v")
    assert(oldView.count() == 60L)
    assert(oldView.agg(org.apache.spark.sql.functions.sum("v")).head().getLong(0)
      == (1L to 60L).map(_ * 2).sum)

    // IVM tolerance across the evolution commit: a view over the
    // ORIGINAL columns refreshes from the manifest diff exactly as for
    // any append — the new column is invisible to its delta scan
    val mv1 = VersionedStore.readVersion(spark, path, 1)
      .agg(count(lit(1)).as("n"), org.apache.spark.sql.functions.sum("v").as("sv"))
      .head()
    val delta = VersionedStore.deltaFiles(spark, path, 1, 2)
    val d = spark.read.parquet(delta.toIndexedSeq: _*)
      .agg(count(lit(1)).as("n"), org.apache.spark.sql.functions.sum("v").as("sv"))
      .head()
    val full = VersionedStore.readVersionMerged(spark, path, 2)
      .agg(count(lit(1)).as("n"), org.apache.spark.sql.functions.sum("v").as("sv"))
      .head()
    assert(mv1.getLong(0) + d.getLong(0) == full.getLong(0))
    assert(mv1.getLong(1) + d.getLong(1) == full.getLong(1),
      "incremental refresh across the add-column commit != full recompute")
  }

  test("readKeys: the multi-key point read opens only bloom-admitted " +
      "files and matches the full-scan semi-join") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_readkeys_").toString + "/store"
    // txn store with stats+blooms: one append, then a dv commit heals
    // the planning metadata (band manifest + bloom side relation)
    // EVEN keys only: odd probes are in-band-but-absent (the bloom's job)
    graft.streaming.VersionedCommitSink.appendBatch(
      (1L to 8000L).map(k => (k * 2, k * 4)).toDF("k", "v")
        .repartitionByRange(8, col("k")).sortWithinPartitions("k"),
      path, 0L)
    VersionedStore.deleteCommitDv(spark, path, Seq(-1L).toDF("k"), "k")
    val v = VersionedStore.versions(spark, path).last
    val all = VersionedStore.versionFiles(spark, path, v)
    // three present keys, all inside ONE band's range
    val keys = Seq(10L, 20L, 30L).toDF("k")
    val got = VersionedStore.readKeys(spark, path, v, keys, "k")
    assert(got.inputFiles.length < all.length,
      s"no pruning: opened ${got.inputFiles.length} of ${all.length}")
    assert(got.select(col("k"), col("v")).as[(Long, Long)].collect().toSet ==
      Set((10L, 20L), (20L, 40L), (30L, 60L)))
    // in-band-but-ABSENT keys (odd): bands admit their range, the bloom
    // subtracts the files before any data read — empty result either way
    val absent = VersionedStore.readKeys(spark, path, v,
      Seq(21L, 4443L).toDF("k"), "k")
    assert(absent.count() == 0)
    assert(absent.inputFiles.length < got.inputFiles.length + 1,
      "bloom admitted files for keys the store never held")
    // a dv-purged key never comes back through the point read
    VersionedStore.deleteCommitDv(spark, path, Seq(10L).toDF("k"), "k")
    val tip = VersionedStore.versions(spark, path).last
    val after = VersionedStore.readKeys(spark, path, tip, keys, "k")
    assert(after.select(col("k")).as[Long].collect().toSet == Set(20L, 30L),
      "a deletion-vectored key leaked through readKeys")
  }
}
