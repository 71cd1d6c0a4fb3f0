package graft

import graft.sources.{KeyBloom, VersionedStore}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Laws of the per-file key blooms (round-14 verdict #3): zero false
  * negatives under any build size; useful pruning — a scattered probe
  * of in-band-but-ABSENT keys must open strictly fewer files than band
  * pruning alone; and the erasure commits stay result-identical with
  * the blooms in the plan. */
class KeyBloomSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** A GAPPY 8-file store: only EVEN keys in 2..1600, file i owning the
    * even keys of (200i, 200(i+1)] — every odd key is in-band for some
    * file (band pruning admits it) but present in none (a bloom must
    * reject it). Manifest starts BAND-ONLY to exercise the heal. */
  private def buildGappyStore(): String = {
    val path = Files.createTempDirectory("graft_bloom_").toString + "/store"
    val dp = VersionedStore.dataPath(path)
    (1L to 800L).map(k => (k * 2, k)).toDF("key", "amount")
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

  test("zero false negatives at every build size; folds stay small for small sets") {
    val rnd = new scala.util.Random(421L)
    for (n <- Seq(3, 100, 5000, 30000)) {
      val keys = Seq.fill(n)(rnd.nextLong()).distinct
      val sealedB = keys.toDF("k")
        .agg(KeyBloom.bloomAgg(col("k"))).head().getAs[Array[Byte]](0)
      val misses = keys.count(!KeyBloom.mightContain(sealedB, _))
      assert(misses == 0, s"n=$n: $misses false negatives — bloom law broken")
      // fold sizing: a tiny set seals near the floor; a saturating set
      // keeps the width its key count needs (graceful, never lossy)
      if (n <= 100)
        assert(sealedB.length <= 1 + KeyBloom.MinBits / 8 * 4,
          s"n=$n sealed to ${sealedB.length} bytes — folding is not engaging")
      // false-positive sanity on a disjoint probe set (not a tight
      // bound — just "the filter actually filters")
      if (n == 5000) {
        val probes = Seq.fill(20000)(rnd.nextLong()).filterNot(keys.toSet)
        val fp = probes.count(KeyBloom.mightContain(sealedB, _)).toDouble /
          probes.size
        assert(fp < 0.1, s"false-positive rate $fp — filter not filtering")
      }
    }
    // null and malformed filters FAIL OPEN (might contain)
    assert(KeyBloom.mightContain(null, 42L))
    assert(KeyBloom.mightContain(Array[Byte](9), 42L))
  }

  test("blooms prune in-band-but-absent probes to strictly fewer files; heal persists them") {
    val path = buildGappyStore()
    // the heal: band-only manifest gains exact bands + blooms, written
    // back so the next planning call reads the k-row stats table only
    val statsDf = VersionedStore.fileKeyStatsBloomed(spark, path, 1, "key")
    val stats = statsDf.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getAs[Array[Byte]](3)))
    assert(stats.length == 8 && stats.forall(_._4 != null))
    // blooms persist in the SHARED side relation, never in the
    // per-version manifest (which every commit copies — the O(keys)
    // commit law must not carry O(files x bloom bytes))
    assert(spark.read.parquet(VersionedStore.manifestPath(path, 1))
      .columns.sorted.toSeq == Seq("file", "mn", "mx"),
      "blooms leaked into the per-version manifest")
    assert(spark.read.parquet(VersionedStore.bloomsDir(path)).count() == 8,
      "the bloom side relation is not one row per file")
    // a second planning call appends NOTHING (blooms written once)
    VersionedStore.fileKeyStatsBloomed(spark, path, 1, "key")
    assert(spark.read.parquet(VersionedStore.bloomsDir(path)).count() == 8,
      "re-planning duplicated bloom entries")
    // zero-false-negative law at the store level: every file admits
    // every key it actually holds
    val perFile = spark.read.parquet(VersionedStore.dataPath(path))
      .select(input_file_name().as("f"), col("key"))
      .collect().map(r => (VersionedStore.canon(r.getString(0)), r.getLong(1)))
    val bloomOf = stats.map(t => t._1 -> t._4).toMap
    val fn = perFile.count { case (f, k) => !KeyBloom.mightContain(bloomOf(f), k) }
    assert(fn == 0, s"$fn store keys rejected by their own file's bloom")
    // the scattered ABSENT probe: odd keys spanning every band — band
    // pruning admits all 8 files, blooms must reject (almost) all
    val probes = (3L to 1590L by 100).toSeq // odd, in-band, absent
    def owningWith(bloom: Boolean): Set[String] = {
      val cond = col("k") >= col("mn") && col("k") <= col("mx")
      val full = if (bloom)
        cond && KeyBloom.mightContainCol(col("bloom"), col("k"))
      else cond
      probes.toDF("k").join(broadcast(statsDf), full)
        .select("file").distinct().collect().map(_.getString(0)).toSet
    }
    val bandOnly = owningWith(bloom = false)
    val bloomed = owningWith(bloom = true)
    assert(bandOnly.size == 8, "precondition: the probe must overlap every band")
    assert(bloomed.size < bandOnly.size,
      s"blooms opened ${bloomed.size} of ${bandOnly.size} files — no pruning")
    // and a PRESENT probe still finds its owner (no lost member)
    val present = owningWith(bloom = true) // absent probes
    val hit = Seq(400L).toDF("k").join(broadcast(statsDf),
        col("k") >= col("mn") && col("k") <= col("mx") &&
          KeyBloom.mightContainCol(col("bloom"), col("k")))
      .select("file").distinct().count()
    assert(hit >= 1, "a present key's owning file was bloom-pruned — FN")
  }

  test("erasure commits are result-identical with blooms in the plan") {
    val path = buildGappyStore()
    // a no-op erasure of in-band-but-absent keys: with blooms the
    // owning set is (near-)empty, and the commit must still no-op
    val absent = (101L to 301L by 50).toSeq // odd = absent
    assert(VersionedStore.deleteCommitDv(spark, path,
      absent.toDF("key"), "key") == 1, "absent-key erasure must not commit")
    // a real scattered erasure purges exactly the present keys
    val mixed = Seq(4L, 5L, 404L, 405L, 1204L, 1205L) // half present
    val v = VersionedStore.deleteCommitDv(spark, path, mixed.toDF("key"), "key")
    assert(v == 2)
    val live = VersionedStore.readVersion(spark, path, 2)
      .select("key").as[Long].collect().toSet
    assert(live == (1L to 800L).map(_ * 2).toSet -- Set(4L, 404L, 1204L))
    // COW mode agrees through the same bloomed planning
    val path2 = buildGappyStore()
    val v2 = VersionedStore.deleteCommit(spark, path2, mixed.toDF("key"), "key")
    assert(v2 == 2)
    val live2 = VersionedStore.readVersion(spark, path2, 2)
      .select("key").as[Long].collect().toSet
    assert(live2 == live, "cow and dv disagree under bloomed planning")
  }
}
