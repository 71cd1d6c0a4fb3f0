package graft

import graft.sources.{StoreLineage, VersionedStore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lineage-surface contracts the gated rows cannot see: operation
  * stamps vs derived labels, tag immutability and the vacuum pin,
  * zero-copy clone physics and the pin lifecycle. */
class StoreLineageSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def ordersSlice(parts: Int, even: Boolean = false) = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        Num.cents(col("o_totalprice")).as("amount_c"))
    if (even) o.filter(col("o_orderkey") % 2 === 0) else o
  }

  test("history stamps every batch verb and the manifest diffs agree") {
    val path = StoreLineage.histStore(spark, dir)
    val h = StoreLineage.history(spark, path)
      .orderBy(col("version")).collect()
    assert(h.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    assert(h.map(_.getString(1)).toSeq ==
      Seq("append", "append", "delete", "optimize"))
    // every commit added files; the COW delete and the optimize removed
    val added = h.map(_.getInt(5))
    val removed = h.map(_.getInt(6))
    assert(added.forall(_ > 0), s"files_added: ${added.toSeq}")
    assert(removed(0) == 0 && removed(1) == 0)
    assert(removed(2) > 0, "COW delete rewrote nothing?")
    // optimize rewrites the whole tip: removed(v4) == n_files(v3)
    assert(removed(3) == h(2).getInt(4),
      s"optimize removed ${removed(3)} of ${h(2).getInt(4)} v3 files")
    // maintenance/backfill pseudo ids are negative; wall clock monotone
    assert(h.forall(r => r.getLong(2) < 0))
    val ts = h.map(_.getLong(3))
    assert(ts.zip(ts.drop(1)).forall { case (a, b) => a < b })
    // operationMetrics (round-16 verdict #8): per-commit row deltas
    // from the bloom side relation's counts. The delete commit's
    // planning statted v1/v2 files and its own rewrites, so versions
    // 1-3 carry exact metrics; the optimize's fresh files are unstatted
    // -> rows_added NULL (unknown, never a guess), while its removals
    // (the fully-statted v3 member set) stay exact.
    def vCount(v: Int) = VersionedStore.readVersion(spark, path, v).count()
    val ra = h.map(r => if (r.isNullAt(7)) None else Some(r.getLong(7)))
    val rr = h.map(r => if (r.isNullAt(8)) None else Some(r.getLong(8)))
    assert(ra(0).contains(vCount(1)) && rr(0).contains(0L))
    assert(ra(1).contains(vCount(2) - vCount(1)) && rr(1).contains(0L))
    // the erasure commit's net row delta equals the version delta
    assert(ra(2).isDefined && rr(2).isDefined &&
      rr(2).get - ra(2).get == vCount(2) - vCount(3),
      s"delete metrics ${ra(2)}/${rr(2)} vs ${vCount(2) - vCount(3)}")
    assert(ra(3).isEmpty, "optimize's unstatted files must read NULL")
    assert(rr(3).contains(vCount(3)),
      "optimize removes the fully-statted v3 member set")
  }

  test("history derives labels on stamp-less stores (manifest-only + dv)") {
    // the q109 store: raw manifests, no txn dir — v3 is a COW update
    val p1 = VersionedStore.store(spark, dir)
    val h1 = StoreLineage.history(spark, p1)
      .orderBy(col("version")).collect()
    assert(h1.take(3).map(_.getString(1)).toSeq ==
      Seq("append", "append", "rewrite"))
    assert(h1.forall(r => r.isNullAt(2)), "manifest-only store has no batch ids")
    // the dv store: manifest copied verbatim + dv relation => delete_dv
    val p2 = VersionedStore.dvStore(spark, dir)
    val h2 = StoreLineage.history(spark, p2)
      .orderBy(col("version")).collect()
    assert(h2.map(_.getString(1)).toSeq == Seq("append", "delete_dv"))
    assert(h2(1).getInt(5) == 0 && h2(1).getInt(6) == 0,
      "a dv commit must not touch the manifest")
    // dv operationMetrics: zero rows added, removed = the vector delta
    assert(h2(1).getLong(7) == 0L && h2(1).getLong(8) > 0L,
      "dv commit metrics must read 0 added / vector-delta removed")
  }

  test("tags: resolve, idempotent re-pin, immutability, drop") {
    val path = VersionedStore.tsStore(spark, dir)
    StoreLineage.tag(spark, path, "spec_t1", 1)
    StoreLineage.tag(spark, path, "spec_t1", 1) // idempotent
    assert(StoreLineage.resolveTag(spark, path, "spec_t1") == 1)
    val tagged = StoreLineage.readTagged(spark, path, "spec_t1")
    val direct = VersionedStore.readVersion(spark, path, 1)
    assert(tagged.exceptAll(direct).isEmpty && direct.exceptAll(tagged).isEmpty)
    intercept[IllegalStateException] {
      StoreLineage.tag(spark, path, "spec_t1", 2) // immutable
    }
    intercept[IllegalArgumentException] {
      StoreLineage.tag(spark, path, "dot.not.allowed", 1)
    }
    StoreLineage.dropTag(spark, path, "spec_t1")
    intercept[NoSuchElementException] {
      StoreLineage.resolveTag(spark, path, "spec_t1")
    }
  }

  test("vacuum retains tagged versions and releases them on drop") {
    val path = Engine.storePath("graft-lineage-vacspec", dir)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    VersionedStore.appendCommit(spark, path, ordersSlice(2), "o_custkey", 2)
    VersionedStore.appendCommit(spark, path,
      ordersSlice(2, even = true), "o_custkey", 1)
    // compaction rewrites the tip, so v1's files become exclusive to it
    VersionedStore.compactCommit(spark, path, "o_custkey", 32L << 20)
    StoreLineage.tag(spark, path, "pin1", 1)
    VersionedStore.vacuum(spark, path, keepVersions = 1)
    // v1 pinned: still committed and fully readable; v2 expired
    assert(VersionedStore.versions(spark, path) == Seq(1, 3))
    assert(VersionedStore.readVersion(spark, path, 1).count() ==
      ordersSlice(2).count())
    // drop the pin: the next vacuum expires v1 and reaps its files
    val v1Files = VersionedStore.versionFiles(spark, path, 1).toSet
    StoreLineage.dropTag(spark, path, "pin1")
    VersionedStore.vacuum(spark, path, keepVersions = 1)
    assert(VersionedStore.versions(spark, path) == Seq(3))
    val v3Files = VersionedStore.versionFiles(spark, path, 3).toSet
    val reaped = v1Files -- v3Files
    assert(reaped.nonEmpty && reaped.forall(f =>
      !fs.exists(new org.apache.hadoop.fs.Path(f))),
      "exclusively-v1 files must be physically deleted once unpinned")
  }

  test("clone copies zero data bytes, pins its source, and diverges COW") {
    val (src, dst) = StoreLineage.cloneDemo(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dst)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // v1 of the clone references the SOURCE's files verbatim
    val srcV1 = VersionedStore.versionFiles(spark, src, 1).toSet
    val dstV1 = VersionedStore.versionFiles(spark, dst, 1).toSet
    assert(dstV1 == srcV1, "clone manifest must reference source files")
    // the divergent append landed under the CLONE's data root only
    val dstV2 = VersionedStore.versionFiles(spark, dst, 2).toSet
    assert((dstV2 -- dstV1).forall(_.startsWith(
      VersionedStore.dataPath(dst))), "divergence leaked outside the clone")
    assert(VersionedStore.versionFiles(spark, src,
      VersionedStore.versions(spark, src).last).toSet.subsetOf(
      srcV1 ++ VersionedStore.versionFiles(spark, src, 2).toSet),
      "source gained files after the branch diverged")
    // provenance + pin present; the pin names the clone deterministically
    assert(StoreLineage.cloneSource(spark, dst).contains((src, 1)))
    val pin = StoreLineage.clonePinName(dst)
    assert(StoreLineage.resolveTag(spark, src, pin) == 1)
    // clone history leads with the clone stamp
    val h = StoreLineage.history(spark, dst).orderBy(col("version")).collect()
    assert(h.map(_.getString(1)).toSeq == Seq("clone", "append"))
    assert(h(0).getInt(5) == srcV1.size)
  }

  test("SQL surface: history/snapshot TVFs and the tag/untag/history CALLs") {
    val path = StoreLineage.histStore(spark, dir)
    val esc = path.replace("'", "''")
    // the history TVF inline in a FROM clause == the operator relation
    val viaTvf = spark.sql(
      s"SELECT version, operation, files_removed FROM graft_history('$esc') " +
        "ORDER BY version").collect()
    val direct = StoreLineage.history(spark, path)
      .orderBy(col("version"))
      .select(col("version"), col("operation"), col("files_removed"))
      .collect()
    assert(viaTvf.toSeq.map(_.toSeq) == direct.toSeq.map(_.toSeq))
    // CALL registers the follow-on view
    GraftCatalog.call(spark, s"CALL graft_store_history('versioned', '$esc')")
    assert(spark.sql("SELECT count(*) FROM graft_store_history")
      .head().getLong(0) == 4L)
    // snapshot TVF: by version number and by tag name, same relation
    GraftCatalog.call(spark,
      s"CALL graft_store_tag('versioned', '$esc', 'sql_pin', '2')")
    val byV = spark.sql(
      s"SELECT count(*) AS n, sum(amount_c) AS a FROM graft_snapshot('$esc', 2)")
    val byTag = spark.sql(
      s"SELECT count(*) AS n, sum(amount_c) AS a " +
        s"FROM graft_snapshot('$esc', 'sql_pin')")
    assert(byV.head().toSeq == byTag.head().toSeq)
    GraftCatalog.call(spark,
      s"CALL graft_store_untag('versioned', '$esc', 'sql_pin')")
    intercept[NoSuchElementException] {
      spark.sql(s"SELECT * FROM graft_snapshot('$esc', 'sql_pin')")
    }
    // TIMESTAMP AS OF through the TVF (round-16 verdict #7): a string
    // that is no tag but parses as a timestamp resolves via
    // versionAsOf — probe between v1 and v2 reads exactly v1
    val ts2 = VersionedStore.tsStore(spark, dir)
    val esc2 = ts2.replace("'", "''")
    val times = VersionedStore.commitTimes(spark, ts2)
    val mid = new java.sql.Timestamp(
      times.head._2 + (times.last._2 - times.head._2) / 2).toString
    val asOf = spark.sql(
      s"SELECT count(*) AS n FROM graft_snapshot('$esc2', '$mid')")
      .head().getLong(0)
    assert(asOf == VersionedStore.readVersion(spark, ts2, 1).count(),
      "timestamp probe between the commits must read exactly v1")
    val atTip = new java.sql.Timestamp(times.last._2).toString
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft_snapshot('$esc2', '$atTip')")
      .head().getLong(0) ==
      VersionedStore.readVersion(spark, ts2, 2).count(),
      "inclusive boundary: a probe at v2's own stamp reads v2")
    // an unparseable non-tag string stays a loud tag error
    intercept[NoSuchElementException] {
      spark.sql(s"SELECT * FROM graft_snapshot('$esc2', 'no_such_tag')")
    }
  }

  test("clone vacuum obeys the ownership rule: borrowed source bytes survive") {
    val src = Engine.storePath("graft-lineage-ownsrc", dir)
    val dst = Engine.storePath("graft-lineage-owndst", dir)
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(src), true)
    fs.delete(new org.apache.hadoop.fs.Path(dst), true)
    VersionedStore.appendCommit(spark, src, ordersSlice(2), "o_custkey", 2)
    StoreLineage.cloneFrom(spark, src, 1, dst)
    val borrowed = VersionedStore.versionFiles(spark, dst, 1).toSet
    // diverge: append, then compact so v1 stops being referenced by the
    // clone's tip, then expire it — without the ownership rule this
    // vacuum would physically delete the SOURCE's data files
    VersionedStore.appendCommit(spark, dst,
      ordersSlice(2, even = true), "o_custkey", 1)
    VersionedStore.compactCommit(spark, dst, "o_custkey", 32L << 20)
    StoreLineage.releaseClone(spark, dst) // drop the pin; not the point here
    VersionedStore.vacuum(spark, dst, keepVersions = 1)
    assert(VersionedStore.versions(spark, dst) == Seq(3))
    assert(borrowed.forall(f =>
      fs.exists(new org.apache.hadoop.fs.Path(f))),
      "clone vacuum deleted source-owned files")
    // the source is untouched and fully readable
    assert(VersionedStore.readVersion(spark, src, 1).count() ==
      ordersSlice(2).count())
    // and the clone's own compacted tip reads clean
    assert(VersionedStore.readVersion(spark, dst, 3).count() ==
      ordersSlice(2).count() + ordersSlice(2, even = true).count())
  }

  test("a clone pin defers the source's dv-fold vacuum (round-16 advice)") {
    // append v1, dv-erase v2, clone v2: without the deferral, vacuum's
    // physical dv fold rewrites the source's retained manifests and
    // deletes the superseded originals — which the clone's VERBATIM
    // manifest copy still references (dangling clone)
    val src = Engine.storePath("graft-lineage-dvsrc", dir)
    val dst = Engine.storePath("graft-lineage-dvdst", dir)
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(src), true)
    fs.delete(new org.apache.hadoop.fs.Path(dst), true)
    VersionedStore.appendCommit(spark, src, ordersSlice(4), "o_custkey", 4)
    import spark.implicits._
    val purgeKeys = ordersSlice(4).select(col("o_custkey")).distinct()
      .orderBy(col("o_custkey")).limit(5).as[Long].collect().toSeq
    VersionedStore.deleteCommitDv(spark, src,
      purgeKeys.toDF("o_custkey"), "o_custkey")
    StoreLineage.cloneFrom(spark, src, 2, dst)
    val want = VersionedStore.readVersion(spark, dst, 1)
      .agg(count(lit(1)), sum(col("amount_c"))).head().toSeq
    // every retained version sits at the dv commit, so WITHOUT the
    // clone pin this vacuum would fold physical; the pin defers it
    VersionedStore.vacuum(spark, src, keepVersions = 1)
    assert(VersionedStore.readVersion(spark, dst, 1)
      .agg(count(lit(1)), sum(col("amount_c"))).head().toSeq == want,
      "source dv-fold vacuum broke the pinned clone")
    // purged keys stay logically erased through the clone read too
    assert(VersionedStore.readVersion(spark, dst, 1)
      .filter(col("o_custkey").isin(purgeKeys: _*)).count() == 0)
    // release the pin: the next vacuum folds physical — dv dirs gone,
    // no purged key byte left in the source's data
    StoreLineage.releaseClone(spark, dst)
    VersionedStore.vacuum(spark, src, keepVersions = 1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      VersionedStore.dvDir(src))), "dv dirs survived the unpinned fold")
    assert(VersionedStore.readVersion(spark, src,
      VersionedStore.versions(spark, src).last)
      .filter(col("o_custkey").isin(purgeKeys: _*)).count() == 0)
  }

  test("a pinned source vacuum keeps the clone readable; release frees it") {
    // disposable source + clone so the gated cloneDemo is untouched
    val src = Engine.storePath("graft-lineage-clonesrc", dir)
    val dst = Engine.storePath("graft-lineage-clonedst2", dir)
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(src), true)
    fs.delete(new org.apache.hadoop.fs.Path(dst), true)
    VersionedStore.appendCommit(spark, src, ordersSlice(2), "o_custkey", 2)
    VersionedStore.appendCommit(spark, src,
      ordersSlice(2, even = true), "o_custkey", 1)
    StoreLineage.cloneFrom(spark, src, 1, dst)
    val expect = ordersSlice(2).count()
    VersionedStore.vacuum(spark, src, keepVersions = 1)
    // the clone's referenced version survives the source vacuum
    assert(VersionedStore.readVersion(spark, dst, 1).count() == expect)
    assert(VersionedStore.versions(spark, src) == Seq(1, 2))
    // release: the pin drops, the next source vacuum expires v1
    StoreLineage.releaseClone(spark, dst)
    VersionedStore.vacuum(spark, src, keepVersions = 1)
    assert(VersionedStore.versions(spark, src) == Seq(2))
  }
}
