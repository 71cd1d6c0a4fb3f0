package graft

import graft.sources.{StoreMerge, VersionedStore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MERGE-statement laws beyond the q133 gate: whole-row update/insert
  * equivalence, the delete action in the SAME single commit, the
  * matched-condition narrowing, SQL MERGE cardinality errors, replay
  * idempotence, the empty-merge no-commit rule, and the CDC feed's
  * classification of merge deletes. */
class StoreMergeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def freshPath(name: String): String = {
    val p = Engine.storePath(name, dir)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    p
  }

  private def rows(kv: (Long, Long)*) = kv.toSeq.toDF("k", "v")

  private def tip(path: String): Map[Long, Long] =
    VersionedStore.readVersion(spark, path,
      VersionedStore.versions(spark, path).max)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("update+insert, delete and matched-cond actions, each ONE commit") {
    val path = freshPath("graft-merge-laws")
    VersionedStore.appendCommit(spark, path,
      rows(1L -> 10L, 2L -> 20L, 3L -> 30L, 4L -> 40L), "k", 2)
    // update matched, insert unmatched
    val v2 = StoreMerge.merge(spark, path,
      rows(2L -> 200L, 5L -> 500L), "k", "update", "insert", batchId = 1L)
    assert(v2.contains(2))
    assert(tip(path) == Map(1L -> 10L, 2L -> 200L, 3L -> 30L,
      4L -> 40L, 5L -> 500L))
    // delete matched (6 unmatched -> ignored), same single-commit verb
    val v3 = StoreMerge.merge(spark, path,
      rows(3L -> 0L, 6L -> 0L), "k", "delete", "ignore", batchId = 2L)
    assert(v3.contains(3))
    assert(tip(path) == Map(1L -> 10L, 2L -> 200L, 4L -> 40L, 5L -> 500L))
    // WHEN MATCHED AND cond: only the qualifying matched row acts;
    // the other matched row keeps its store value, unmatched inserts
    val v4 = StoreMerge.merge(spark, path,
      rows(1L -> 111L, 2L -> 222L, 7L -> 700L), "k", "update", "insert",
      matchedCond = Some("v > 200"), batchId = 3L)
    assert(v4.contains(4))
    assert(tip(path) == Map(1L -> 10L, 2L -> 222L, 4L -> 40L,
      5L -> 500L, 7L -> 700L))
    // exactly one version per statement, stamped 'merge'
    assert(VersionedStore.versions(spark, path) == Seq(1, 2, 3, 4))
    val ops = sources.StoreLineage.history(spark, path)
      .orderBy(col("version")).select(col("operation"))
      .collect().map(_.getString(0)).toSeq
    assert(ops == Seq("append", "merge", "merge", "merge"))
  }

  test("cardinality error, replay no-op, empty-merge commits nothing") {
    val path = freshPath("graft-merge-edges")
    VersionedStore.appendCommit(spark, path, rows(1L -> 10L), "k", 1)
    // duplicate source keys: the SQL MERGE cardinality rule
    intercept[IllegalArgumentException] {
      StoreMerge.merge(spark, path, rows(1L -> 1L, 1L -> 2L), "k",
        "update", "insert", batchId = 10L)
    }
    StoreMerge.merge(spark, path, rows(2L -> 20L), "k",
      "update", "insert", batchId = 11L)
    // replayed batch id: nothing commits (exactly-once)
    assert(StoreMerge.merge(spark, path, rows(3L -> 30L), "k",
      "update", "insert", batchId = 11L).isEmpty)
    // an effectively-empty statement (delete matching nothing) commits
    // no version — the Delta empty-merge rule
    assert(StoreMerge.merge(spark, path, rows(99L -> 0L), "k",
      "delete", "ignore", batchId = 12L).isEmpty)
    assert(VersionedStore.versions(spark, path) == Seq(1, 2))
    assert(tip(path) == Map(1L -> 10L, 2L -> 20L))
  }

  test("the change feed classifies a mixed merge: insert, update pair, delete") {
    val path = freshPath("graft-merge-cdc")
    VersionedStore.appendCommit(spark, path,
      rows(1L -> 10L, 2L -> 20L, 3L -> 30L), "k", 1)
    StoreMerge.merge(spark, path, rows(2L -> 200L, 9L -> 900L), "k",
      "update", "insert", batchId = 1L)
    StoreMerge.merge(spark, path, rows(3L -> 0L), "k",
      "delete", "ignore", batchId = 2L)
    val feed = sources.ChangeFeed.changes(spark, path, 1, 3, "k")
      .select(col("_commit_version"), col("_change_type"), col("k"), col("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(feed == Set(
      (2L, "update_preimage", 2L, 20L), (2L, "update_postimage", 2L, 200L),
      (2L, "insert", 9L, 900L),
      (3L, "delete", 3L, 30L)),
      s"merge feed misclassified: $feed")
  }
}
