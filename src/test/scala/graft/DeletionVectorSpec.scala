package graft

import graft.sources.VersionedStore
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Physical laws of the DELETION-VECTOR erasure commit (round-13
  * verdict order #2) — the scale regime copy-on-write handles badly:
  * a scattered erasure batch must cost O(deleted rows) bytes where COW
  * rewrites most of the store; the two modes must agree bit-for-bit on
  * every read; compaction and vacuum must FOLD the vector physical,
  * extending the unrecoverability law to dv entries; and pre-delete
  * history must stay readable until it expires. */
class DeletionVectorSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** A key-clustered 8-file store with a STATS manifest: keys 1..800,
    * file i owns (100i, 100(i+1)]. */
  private def buildStore(): String = {
    val path = Files.createTempDirectory("graft_dv_").toString + "/store"
    val dp = VersionedStore.dataPath(path)
    (1L to 800L).map(k => (k, k * 10)).toDF("key", "amount")
      .repartitionByRange(8, col("key")).sortWithinPartitions("key")
      .write.mode(SaveMode.Overwrite).parquet(dp)
    spark.read.parquet(dp)
      .groupBy(input_file_name().as("file"))
      .agg(min(col("key")).as("mn"), max(col("key")).as("mx"))
      .collect()
      .map(r => (VersionedStore.canon(r.getString(0)), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq.toDF("file", "mn", "mx")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(VersionedStore.manifestPath(path, 1))
    path
  }

  private def dirBytes(p: String): Long = {
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hp)) 0L
    else fs.getContentSummary(hp).getLength
  }

  /** Every key readable from ANY parquet byte under the store root —
    * data files, dv relations, staging; the unrecoverability probe. */
  private def allKeysOnDisk(path: String): Set[Long] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listFiles(hp, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (files.hasNext) {
      val f = files.next().getPath.toString
      // manifests list file PATHS, not keys — only data/dv parquet counts
      if (f.endsWith(".parquet") && !f.contains("/manifest/")) buf += f
    }
    buf.toSeq.flatMap { f =>
      val df = spark.read.parquet(f)
      if (df.columns.contains("key"))
        df.select(col("key").cast("long")).as[Long].collect()
      else Nil
    }.toSet
  }

  // keys scattered across EVERY band: one per 8-key stride
  private val scattered = (1L to 800L by 8).toSeq

  test("a scattered erasure costs O(keys) bytes where COW rewrites the whole store") {
    // a store big enough that data outweighs parquet format overhead
    // (the cost law is about bytes, so the fixture must have some):
    // 80k rows in 8 band files; the erasure is ~825 keys hitting EVERY
    // band — the scattered regime dv mode exists for
    val path = Files.createTempDirectory("graft_dvbig_").toString + "/store"
    val dp = VersionedStore.dataPath(path)
    (1L to 80000L).map(k => (k, k * 10)).toDF("key", "amount")
      .repartitionByRange(8, col("key")).sortWithinPartitions("key")
      .write.mode(SaveMode.Overwrite).parquet(dp)
    spark.read.parquet(dp)
      .groupBy(input_file_name().as("file"))
      .agg(min(col("key")).as("mn"), max(col("key")).as("mx"))
      .collect()
      .map(r => (VersionedStore.canon(r.getString(0)), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq.toDF("file", "mn", "mx")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(VersionedStore.manifestPath(path, 1))
    val scattered = (1L to 80000L by 97).toSeq // ~825 keys, all bands
    val storeBytes = dirBytes(VersionedStore.dataPath(path))
    val f1 = VersionedStore.versionFiles(spark, path, 1).toSet

    val v = VersionedStore.deleteCommitDv(spark, path, scattered.toDF("key"), "key")
    assert(v == 2)
    // zero data files written or dropped: the manifest is the parent's
    val f2 = VersionedStore.versionFiles(spark, path, 2).toSet
    assert(f2 == f1, "a dv commit must share every data file by reference")
    assert(dirBytes(VersionedStore.dataPath(path)) == storeBytes,
      "a dv commit wrote into the data directory")
    // the commit's entire write cost is the dv relation + manifest copy
    val commitBytes = dirBytes(VersionedStore.dvPath(path, 2)) +
      dirBytes(VersionedStore.manifestPath(path, 2))
    assert(commitBytes < storeBytes / 10,
      s"dv commit wrote $commitBytes bytes vs store $storeBytes — not O(keys)")
    // ...where COW would have rewritten EVERY file (each band owns keys)
    val owningCow = {
      val stats = spark.read.parquet(VersionedStore.manifestPath(path, 1))
      scattered.toDF("k").join(stats,
        col("k") >= col("mn") && col("k") <= col("mx"))
        .select("file").distinct().count()
    }
    assert(owningCow == 8, "the scattered batch must touch every band")
    // logical content: exactly the survivors, bit-stable across reads
    val tip = VersionedStore.readVersion(spark, path, 2)
      .select("key").as[Long].collect().toSet
    assert(tip == (1L to 80000L).toSet -- scattered)
    // history: v1 still reads everything (the dv applies from v2 only)
    assert(VersionedStore.readVersion(spark, path, 1).count() == 80000L)
    // replay: the same batch commits NOTHING (keys already dv-purged)
    assert(VersionedStore.deleteCommitDv(spark, path,
      scattered.toDF("key"), "key") == 2)
    assert(VersionedStore.versions(spark, path) == Seq(1, 2))
  }

  test("dv and cow modes agree bit-for-bit on the post-purge read") {
    val (a, b) = (buildStore(), buildStore())
    val keys = (37L to 700L by 13).toSeq
    VersionedStore.deleteCommit(spark, a, keys.toDF("key"), "key")
    VersionedStore.deleteCommitDv(spark, b, keys.toDF("key"), "key")
    def snap(p: String) = VersionedStore
      .readVersion(spark, p, VersionedStore.versions(spark, p).last)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(snap(a) == snap(b),
      "the two physical erasure modes disagree on the logical result")
  }

  test("compaction folds the dv physical and supersedes the lineage") {
    val path = buildStore()
    VersionedStore.deleteCommitDv(spark, path, scattered.toDF("key"), "key")
    val v = VersionedStore.compactCommit(spark, path, "key",
      targetFileBytes = 1L << 20)
    assert(v == 3)
    // the compacted files physically exclude every purged key
    val raw = spark.read
      .parquet(VersionedStore.versionFiles(spark, path, 3).toIndexedSeq: _*)
      .select("key").as[Long].collect().toSet
    assert((raw & scattered.toSet).isEmpty,
      "compaction carried purged rows into the rewritten files")
    assert(raw == (1L to 800L).toSet -- scattered)
    // the lineage is superseded: v3's dv is EMPTY, so reads pay no
    // anti-join right side; v2 still resolves its own (non-empty) dv
    assert(spark.read.parquet(VersionedStore.dvPath(path, 3)).count() == 0)
    assert(VersionedStore.readVersion(spark, path, 3).count() ==
      800L - scattered.size)
    assert(VersionedStore.readVersion(spark, path, 2).count() ==
      800L - scattered.size)
  }

  test("vacuum folds in place: no parquet byte nor dv entry holds a purged key") {
    val path = buildStore()
    VersionedStore.deleteCommitDv(spark, path, scattered.toDF("key"), "key")
    // pre-retention the purged bytes are still on disk (auditable history)
    assert(scattered.toSet.subsetOf(allKeysOnDisk(path)))
    val (expired, deleted) = VersionedStore.vacuum(spark, path, keepVersions = 1)
    assert(expired == 1 && deleted >= 8,
      s"fold must delete the superseded originals (deleted=$deleted)")
    val after = allKeysOnDisk(path)
    assert((after & scattered.toSet).isEmpty,
      "purged keys recoverable from disk after vacuum — erasure not physical")
    assert(after == (1L to 800L).toSet -- scattered, "vacuum lost retained rows")
    // the dv lineage is gone with the bytes
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(VersionedStore.dvDir(path))),
      "vacuum left dv relations behind after the fold")
    // the retained tip reads bit-stable through its updated manifest
    val tip = VersionedStore.readVersion(spark, path,
      VersionedStore.versions(spark, path).last)
    assert(tip.count() == 800L - scattered.size)
    assert(tip.agg(sum("amount")).head().getLong(0) ==
      (1L to 800L).filterNot(scattered.contains).map(_ * 10).sum)
  }

  test("vacuum keeps the dv while pre-delete history is retained") {
    val path = buildStore()
    VersionedStore.deleteCommitDv(spark, path, scattered.toDF("key"), "key")
    VersionedStore.vacuum(spark, path, keepVersions = 2)
    // v1 predates the dv commit and must still read the purged rows;
    // the dv dir therefore survives this vacuum
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(VersionedStore.dvPath(path, 2))))
    assert(VersionedStore.readVersion(spark, path, 1).count() == 800L)
    assert(VersionedStore.readVersion(spark, path, 2).count() ==
      800L - scattered.size)
    // once the pre-delete history expires, the fold happens
    VersionedStore.vacuum(spark, path, keepVersions = 1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(VersionedStore.dvDir(path))))
    assert((allKeysOnDisk(path) & scattered.toSet).isEmpty)
  }

  test("IVM retract across a dv commit equals full recompute") {
    // a dv commit's manifest diff is EMPTY, so the incremental refresh
    // derives its retraction from the DV DIFF: subtract exactly the
    // purged keys' partials, computed from the stats-pruned owning
    // files semi-joined to the keys — refresh cost ∝ deleted rows
    val path = buildStore()
    val base = VersionedStore.readVersion(spark, path, 1)
      .withColumn("g", col("key") % 10)
      .groupBy("g").agg(count(lit(1)).as("n1"), sum("amount").as("a1"))
    val purge = (101L to 400L by 9).toSeq
    VersionedStore.deleteCommitDv(spark, path, purge.toDF("key"), "key")
    assert(VersionedStore.versionFiles(spark, path, 2).toSeq.sorted ==
      VersionedStore.versionFiles(spark, path, 1).toSeq.sorted,
      "precondition: the dv commit must share every file")
    val dv = spark.read.parquet(VersionedStore.dvPath(path, 2))
    val removed = VersionedStore.readVersion(spark, path, 1)
      .join(dv, Seq("key"), "left_semi")
      .withColumn("g", col("key") % 10)
      .groupBy("g").agg(count(lit(1)).as("rn"), sum("amount").as("ra"))
    val inc = base.join(removed, Seq("g"), "full_outer")
      .select(col("g"),
        (coalesce(col("n1"), lit(0L)) - coalesce(col("rn"), lit(0L))).as("n"),
        (coalesce(col("a1"), lit(0L)) - coalesce(col("ra"), lit(0L))).as("a"))
      .filter(col("n") > 0)
    val full = VersionedStore.readVersion(spark, path, 2)
      .withColumn("g", col("key") % 10)
      .groupBy("g").agg(count(lit(1)).as("n"), sum("amount").as("a"))
    assert(inc.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq ==
      full.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq,
      "incremental-across-dv diverged from the full recompute")
  }

  test("an orphan dv from a crashed commit stays invisible until vacuum reclaims it") {
    // round-14 advice: deleteCommitDv writes the dv parquet BEFORE the
    // manifest/txn commit — a crash between the two leaves an orphan dv
    // at a claimed-but-uncommitted slot. dvAt must gate on the COMMITTED
    // version set so the orphan never becomes the effective vector for a
    // later-committed read (hiding rows whose deletion never committed).
    val path = buildStore()
    val firstBatch = (1L to 100L by 10).toSeq
    assert(VersionedStore.deleteCommitDv(spark, path,
      firstBatch.toDF("key"), "key") == 2)
    // the crash: slot 3 claimed, dv written, NO manifest/txn commit
    assert(VersionedStore.claimVersion(spark, path, 3) == 3)
    val orphanKeys = (200L to 300L by 10).toSeq
    spark.read.parquet(VersionedStore.dvPath(path, 2))
      .unionByName(orphanKeys.toDF("key"))
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(VersionedStore.dvPath(path, 3))
    // a later commit lands ABOVE the orphan slot (burn-and-loop past
    // the dead claim) and must resolve its parent dv as v2's, not v3's
    val secondBatch = Seq(401L, 402L)
    val v = VersionedStore.deleteCommitDv(spark, path,
      secondBatch.toDF("key"), "key", settleTimeoutMs = 500L)
    assert(v == 4, s"commit did not burn past the orphan claim: v$v")
    val expectLive = (1L to 800L).toSet -- firstBatch -- secondBatch
    val tip = VersionedStore.readVersion(spark, path, 4)
      .select("key").as[Long].collect().toSet
    assert((tip & orphanKeys.toSet) == orphanKeys.toSet,
      "the orphan dv's uncommitted deletions leaked into a committed read")
    assert(tip == expectLive)
    // vacuum reclaims the orphan slot: claim + dv go together (grace 0 —
    // the quiesced-maintenance setting; the default grace protects a
    // LIVE in-flight commit's claim instead)
    VersionedStore.vacuum(spark, path, keepVersions = 10, claimGraceMs = 0L)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(VersionedStore.dvPath(path, 3))),
      "vacuum left the orphan dv behind")
    assert(VersionedStore.readVersion(spark, path, 4)
      .select("key").as[Long].collect().toSet == expectLive,
      "reclaiming the orphan changed a committed read")
  }

  test("vacuum's dv fold is crash-idempotent: a re-fold over fold files succeeds") {
    // round-14 advice: a crash after the fold swapped manifests but
    // before the dv dirs were removed re-runs the fold with the FOLD
    // FILES as owning files; staging into the same fold_v$tip/$i dirs
    // would Overwrite-delete the file being read. Re-create exactly that
    // post-crash state (manifests at fold files + dv dirs present) and
    // re-run: the attempt-unique staging dir must make it succeed.
    val path = buildStore()
    VersionedStore.deleteCommitDv(spark, path, scattered.toDF("key"), "key")
    val dvSnapshot = spark.read.parquet(VersionedStore.dvPath(path, 2)).collect()
      .map(_.getLong(0)).toSeq
    VersionedStore.vacuum(spark, path, keepVersions = 1)
    // the crash-leftover state: retained manifests already point at
    // fold files; the dv dir is back as if its removal never happened
    dvSnapshot.toDF("key").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(VersionedStore.dvPath(path, 2))
    val (_, deleted) = VersionedStore.vacuum(spark, path, keepVersions = 1)
    assert(deleted >= 1, "re-fold rewrote nothing — the scenario is vacuous")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(VersionedStore.dvDir(path))),
      "re-run vacuum left dv relations behind")
    // every retained manifest entry resolves to a live file and the
    // logical content is exactly the survivors — nothing double-deleted
    val tipV = VersionedStore.versions(spark, path).last
    val tip = VersionedStore.readVersion(spark, path, tipV)
      .select("key").as[Long].collect().toSet
    assert(tip == (1L to 800L).toSet -- scattered,
      "re-fold corrupted the retained version")
    assert((allKeysOnDisk(path) & scattered.toSet).isEmpty)
  }

  test("a dv crossing the configured fraction triggers the automatic fold") {
    // round-14 verdict #4: fold cadence must not be purely the
    // operator's job — a commit that pushes the vector past the
    // configured fraction of the tip's rows self-schedules the
    // compaction (store rows from the side relation's exact per-file
    // counts, no scan).
    val path = buildStore() // 800 rows
    // below the fraction: the commit stays a pure dv commit
    val small = (11L to 50L).toSeq // 40 keys = 5%
    assert(VersionedStore.deleteCommitDv(spark, path, small.toDF("key"), "key",
      autoFoldFraction = 0.25) == 2)
    assert(VersionedStore.versions(spark, path) == Seq(1, 2),
      "a below-threshold dv commit must not trigger maintenance")
    assert(spark.read.parquet(VersionedStore.dvPath(path, 2)).count() == 40)
    // crossing: cumulative 40 + 260 = 300 of 800 (37.5%) >= 25% — the
    // dv commit lands (v3) and the triggered fold commits above it (v4)
    val big = (301L to 560L).toSeq
    val v = VersionedStore.deleteCommitDv(spark, path, big.toDF("key"), "key",
      autoFoldFraction = 0.25, foldTargetFileBytes = 1L << 20)
    assert(v == 3, s"dv commit landed at v$v")
    assert(VersionedStore.versions(spark, path) == Seq(1, 2, 3, 4),
      "the crossing commit did not trigger the fold")
    // the fold superseded the lineage: v4's vector is EMPTY and its
    // files physically exclude every purged key
    assert(spark.read.parquet(VersionedStore.dvPath(path, 4)).count() == 0)
    val raw = spark.read
      .parquet(VersionedStore.versionFiles(spark, path, 4).toIndexedSeq: _*)
      .select("key").as[Long].collect().toSet
    val purged = small.toSet ++ big
    assert((raw & purged).isEmpty,
      "the triggered fold carried purged rows into the rewrite")
    // reads stable throughout the ladder
    val expect = (1L to 800L).toSet -- purged
    assert(VersionedStore.readVersion(spark, path, 4)
      .select("key").as[Long].collect().toSet == expect)
    assert(VersionedStore.readVersion(spark, path, 3)
      .select("key").as[Long].collect().toSet == expect)
    assert(VersionedStore.readVersion(spark, path, 1).count() == 800L)
  }

  test("the cumulative dv write is sized from its key volume") {
    val path = buildStore()
    // a tiny per-file target forces the ceil rule to split the vector;
    // reads must be file-layout blind
    val keys = (1L to 400L).toSeq
    assert(VersionedStore.deleteCommitDv(spark, path, keys.toDF("key"), "key",
      dvTargetFileBytes = 1024L, autoFoldFraction = 0.0) == 2)
    val dvFiles = spark.read.parquet(VersionedStore.dvPath(path, 2))
      .inputFiles.length
    assert(dvFiles >= 2,
      s"400-key dv at a 1 KiB target landed in $dvFiles file(s) — not sized")
    assert(VersionedStore.readVersion(spark, path, 2).count() == 400L)
    // and the default target keeps a small vector in ONE file
    val path2 = buildStore()
    VersionedStore.deleteCommitDv(spark, path2, keys.toDF("key"), "key",
      autoFoldFraction = 0.0)
    assert(spark.read.parquet(VersionedStore.dvPath(path2, 2))
      .inputFiles.length == 1)
  }

  test("the streaming purge sink drives dv mode with no-op replay") {
    val path = buildStore()
    val v = graft.streaming.PurgeSink.purgeBatch(
      scattered.take(10).toDF("key"), path, "key", mode = "dv")
    assert(v.contains(2))
    // replay of the same batch: nothing newly purged, no version
    assert(graft.streaming.PurgeSink.purgeBatch(
      scattered.take(10).toDF("key"), path, "key", mode = "dv").isEmpty)
    // a later batch extends the cumulative vector
    val v2 = graft.streaming.PurgeSink.purgeBatch(
      Seq(500L, 501L).toDF("key"), path, "key", mode = "dv")
    assert(v2.contains(3))
    val tip = VersionedStore.readVersion(spark, path, 3)
      .select("key").as[Long].collect().toSet
    assert(tip == (1L to 800L).toSet -- scattered.take(10) - 500L - 501L)
  }
}
