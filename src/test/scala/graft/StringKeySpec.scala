package graft

import graft.sources.VersionedStore
import graft.streaming.UpsertSink
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** String keys in the versioned-store key machinery (round-15 verdict
  * #2): bands and blooms operate on the xxhash64 image of string keys —
  * hashed bands are near-vacuous for range pruning, so the BLOOMS carry
  * the point prune; membership stays exact (zero false negatives), the
  * COW/dv erasure and the subject-access read work on the subject ids
  * real erasure batches carry, and unsupported key types fail loudly. */
class StringKeySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_strkey_$tag").toString + "/store"

  private def rows(n: Int) =
    (1 to n).map(i => (f"user-$i%04d@example.com", i.toLong, i * 10L))
      .toDF("email", "uid", "amount")

  test("string-keyed COW erasure: exact removal, bloom-pruned point " +
      "reads, idempotent replay") {
    val path = tmp("cow")
    VersionedStore.appendCommit(spark, path, rows(400), "email", 8)
    val subjects = Seq("user-0007@example.com", "user-0123@example.com",
      "user-0311@example.com")
    val v = VersionedStore.deleteCommit(spark, path,
      subjects.toDF("email"), "email")
    val tip = VersionedStore.readVersion(spark, path, v)
    assert(tip.count() == 397)
    assert(tip.filter(col("email").isin(subjects: _*)).count() == 0)
    // the pre-purge version still reads the subjects (history preserved)
    assert(VersionedStore.readVersion(spark, path, 1)
      .filter(col("email").isin(subjects: _*)).count() == 3)
    // subject-access point read through hashed bands + blooms: exact
    // rows, opening FEWER files than the manifest lists (hashed bands
    // are vacuous, so any prune is the blooms' work)
    val one = VersionedStore.readKeys(spark, path, 1,
      Seq("user-0042@example.com").toDF("email"), "email")
    assert(one.select("uid").as[Long].collect().toSeq == Seq(42L))
    val allFiles = VersionedStore.versionFiles(spark, path, 1).length
    assert(one.inputFiles.length < allFiles,
      s"1-key probe opened ${one.inputFiles.length} of $allFiles files — " +
        "blooms pruned nothing in hashed key space")
    // replayed erasure commits nothing (the no-op contract)
    assert(VersionedStore.deleteCommit(spark, path,
      subjects.toDF("email"), "email") == v)
  }

  test("string-keyed dv erasure folds physical at vacuum: no subject " +
      "byte recoverable from any retained file") {
    val path = tmp("dv")
    VersionedStore.appendCommit(spark, path, rows(300), "email", 4)
    val subjects = (1 to 300 by 37).map(i => f"user-$i%04d@example.com")
    val v = VersionedStore.deleteCommitDv(spark, path,
      subjects.toDF("email"), "email")
    assert(VersionedStore.readVersion(spark, path, v)
      .filter(col("email").isin(subjects: _*)).count() == 0)
    VersionedStore.vacuum(spark, path, 1, claimGraceMs = 0L)
    val tipV = VersionedStore.versions(spark, path).last
    val files = VersionedStore.versionFiles(spark, path, tipV)
    assert(files.nonEmpty)
    assert(spark.read.parquet(files.toIndexedSeq: _*)
      .filter(col("email").isin(subjects: _*)).count() == 0,
      "a purged subject is recoverable from a retained file post-fold")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      VersionedStore.dvDir(path))) ||
      VersionedStore.readVersion(spark, path, tipV).count() == 300 - subjects.size)
  }

  test("string-keyed upsert: matched names replace, new names insert, " +
      "touched reads stay pruned") {
    val path = tmp("ups")
    assert(UpsertSink.upsertBatch(rows(100), path, 0L, "email").contains(1))
    val batch = Seq(("user-0050@example.com", 50L, 9999L),
      ("user-0101@example.com", 101L, 1010L)).toDF("email", "uid", "amount")
    assert(UpsertSink.upsertBatch(batch, path, 1L, "email").contains(2))
    val store = UpsertSink.readStore(spark, path)
    assert(store.count() == 101)
    assert(store.filter(col("email") === "user-0050@example.com")
      .select("amount").as[Long].head() == 9999L)
    // readTouched is a FILE-grain over-approximation; under hashed
    // (vacuous) bands it degrades toward the whole store — correct,
    // never wrong: the touched rows are a superset containing the key
    val touched = UpsertSink.readTouched(spark, path,
      Seq("user-0101@example.com").toDF("email"), "email").get
    assert(touched.filter(col("email") === "user-0101@example.com")
      .select("amount").as[Long].collect().toSeq == Seq(1010L))
  }

  test("unsupported key types fail loudly, never an all-null cast") {
    val path = tmp("bad")
    VersionedStore.appendCommit(spark, path, rows(10), "email", 1)
    val ex = intercept[IllegalArgumentException] {
      VersionedStore.deleteCommit(spark, path,
        Seq(1.5).toDF("amount"), "amount")
    }
    assert(ex.getMessage.contains("unsupported store key type"))
  }
}
