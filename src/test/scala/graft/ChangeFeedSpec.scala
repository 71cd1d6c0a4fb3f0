package graft

import graft.sources.{ChangeFeed, VersionedStore}
import graft.streaming.ChangeFeedReader
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Laws of the read-path change feed (the table_changes verb): replay
  * reconstructs every version, compaction is change-free, the two
  * erasure modes emit the same deletes, the feed's bytes track the
  * commit delta, and the checkpointed reader re-delivers deterministically
  * until its watermark commits. */
class ChangeFeedSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Key-clustered 8-file store, v1 committed through the txn path so
    * every later commit shares one lineage mode. */
  private def buildStore(tag: String): String = {
    val path = Files.createTempDirectory(s"graft_cdf_$tag").toString + "/store"
    VersionedStore.appendCommit(spark, path,
      (1L to 800L).map(k => (k, k * 10)).toDF("key", "amount"), "key", 8)
    path
  }

  private def asSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("key").cast("long"), col("amount").cast("long"))
      .as[(Long, Long)].collect().toSet

  /** CDF replay: subtract deletes/update-preimages, add inserts/
    * update-postimages. */
  private def applyStep(prev: DataFrame, step: DataFrame): DataFrame = {
    val gone = step.filter(col(ChangeFeed.ChangeType)
        .isin("delete", "update_preimage")).select("key")
    val add = step.filter(col(ChangeFeed.ChangeType)
        .isin("insert", "update_postimage")).select("key", "amount")
    prev.select("key", "amount").join(gone, Seq("key"), "left_anti")
      .unionByName(add)
  }

  test("replay law: the feed reconstructs every version across append, " +
      "COW delete, dv delete and compaction; compaction is change-free") {
    val path = buildStore("replay")
    VersionedStore.appendCommit(spark, path,
      (801L to 900L).map(k => (k, k * 10)).toDF("key", "amount"), "key", 1)
    VersionedStore.deleteCommit(spark, path,
      (1L to 50L).toDF("key"), "key")
    VersionedStore.deleteCommitDv(spark, path,
      (100L to 400L by 8).toDF("key"), "key")
    val compactV = VersionedStore.compactCommit(spark, path, "key", 1L << 30)
    val vs = VersionedStore.versions(spark, path)
    assert(vs.size == 5, s"expected 5 committed versions, got $vs")

    vs.sliding(2).toSeq.collect { case Seq(va, vb) => (va, vb) }
      .foreach { case (va, vb) =>
        val step = ChangeFeed.changesBetween(spark, path, va, vb, "key")
        val replayed = applyStep(VersionedStore.readVersion(spark, path, va), step)
        assert(asSet(replayed) == asSet(VersionedStore.readVersion(spark, path, vb)),
          s"replay v$va -> v$vb diverged from the committed snapshot")
        if (vb == compactV)
          assert(step.count() == 0,
            s"compaction commit v$vb emitted ${step.count()} change rows")
      }

    // the multi-step feed is the union of its steps, commit-stamped
    val all = ChangeFeed.changes(spark, path, vs.head, vs.last, "key")
    val perStep = vs.sliding(2).collect { case Seq(va, vb) =>
      ChangeFeed.changesBetween(spark, path, va, vb, "key").count()
    }.sum
    assert(all.count() == perStep)
    assert(all.select(col(ChangeFeed.CommitVersion)).distinct().count() ==
      vs.size - 2, "only change-bearing commits appear in the feed")
    // an end version beyond the tip fails loudly, never truncates
    val ex = intercept[IllegalArgumentException] {
      ChangeFeed.changes(spark, path, vs.head, vs.last + 50, "key")
    }
    assert(ex.getMessage.contains("not committed"))
  }

  test("erasure-mode parity: COW and dv commits emit the same delete rows") {
    val keys = (5L to 795L by 13).toDF("key")
    val cow = buildStore("cow")
    VersionedStore.deleteCommit(spark, cow, keys, "key")
    val dv = buildStore("dv")
    VersionedStore.deleteCommitDv(spark, dv, keys, "key")
    def deletes(path: String) = {
      val Seq(va, vb) = VersionedStore.versions(spark, path).takeRight(2)
      val step = ChangeFeed.changesBetween(spark, path, va, vb, "key")
      assert(step.select(col(ChangeFeed.ChangeType)).distinct()
        .as[String].collect().toSet == Set("delete"))
      // both physical modes persist write-path CDC: the adjacent-pair
      // feed reads zero data files
      assert(step.inputFiles.nonEmpty &&
        step.inputFiles.forall(_.contains("/cdc/")),
        s"$path feed read outside cdc/: ${step.inputFiles.toSeq}")
      asSet(step)
    }
    assert(deletes(cow) == deletes(dv),
      "the two physical erasure modes must feed identical deletes")
  }

  test("cost law: an append step's feed reads only the appended files") {
    val path = buildStore("cost")
    VersionedStore.appendCommit(spark, path,
      (801L to 820L).map(k => (k, k * 10)).toDF("key", "amount"), "key", 1)
    val Seq(v1, v2) = VersionedStore.versions(spark, path)
    val f1 = VersionedStore.versionFiles(spark, path, v1).toSet
    val f2 = VersionedStore.versionFiles(spark, path, v2).toSet
    val step = ChangeFeed.changesBetween(spark, path, v1, v2, "key")
    val opened = step.inputFiles.map(VersionedStore.canon).toSet
    assert(opened.nonEmpty && opened.subsetOf(f2 -- f1),
      s"append feed touched non-delta files: ${opened -- (f2 -- f1)}")
    assert(step.count() == 20 &&
      step.select(col(ChangeFeed.ChangeType)).distinct()
        .as[String].collect().toSet == Set("insert"))
  }

  test("update commits emit pre/post pairs for CHANGED rows only") {
    // fully-manual legacy store (manifest-presence commits): the COW
    // update below writes its manifest by hand in the same mode
    val path = Files.createTempDirectory("graft_cdf_upd").toString + "/store"
    (1L to 800L).map(k => (k, k * 10)).toDF("key", "amount")
      .repartitionByRange(8, col("key")).sortWithinPartitions("key")
      .write.mode(SaveMode.Overwrite).parquet(VersionedStore.dataPath(path))
    VersionedStore.writeManifest(spark, path, 1,
      VersionedStore.hadoopLs(spark, VersionedStore.dataPath(path)))
    // hand-rolled COW update in the store's own idiom: rewrite the file
    // owning keys <= 100, bumping only keys 1..10
    val f1 = VersionedStore.versionFiles(spark, path, 1).toSet
    val stats = spark.read.parquet(f1.toSeq: _*)
      .groupBy(input_file_name().as("file"))
      .agg(max(col("key")).as("mx"))
    val owning = stats.filter(col("mx") <= 100L)
      .select("file").as[String].collect().map(VersionedStore.canon).toSet
    assert(owning.size == 1)
    val dp = VersionedStore.dataPath(path)
    spark.read.parquet(owning.toSeq: _*)
      .withColumn("amount",
        when(col("key") <= 10L, col("amount") + 5L).otherwise(col("amount")))
      .coalesce(1).write.mode(SaveMode.Append).parquet(dp)
    val after = VersionedStore.hadoopLs(spark, dp)
    VersionedStore.writeManifest(spark, path, 2, (f1 -- owning) ++ (after -- f1))

    val step = ChangeFeed.changesBetween(spark, path, 1, 2, "key")
    val byType = step.groupBy(col(ChangeFeed.ChangeType)).count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map("update_preimage" -> 10L, "update_postimage" -> 10L),
      s"expected 10 update pairs, got $byType")
    val pre = step.filter(col(ChangeFeed.ChangeType) === "update_preimage")
    val post = step.filter(col(ChangeFeed.ChangeType) === "update_postimage")
    assert(asSet(pre) == (1L to 10L).map(k => (k, k * 10)).toSet)
    assert(asSet(post) == (1L to 10L).map(k => (k, k * 10 + 5)).toSet)
  }

  test("write-path CDC: a delete commit's feed reads the persisted " +
      "change rows; non-adjacent pairs fall back to the net diff") {
    val path = buildStore("cdc")
    VersionedStore.appendCommit(spark, path,
      (801L to 900L).map(k => (k, k * 10)).toDF("key", "amount"), "key", 1)
    VersionedStore.deleteCommit(spark, path, (1L to 40L).toDF("key"), "key")
    val Seq(v1, v2, v3) = VersionedStore.versions(spark, path)
    // adjacent pair: served from cdc/, O(deleted rows) bytes
    val feed = ChangeFeed.changesBetween(spark, path, v2, v3, "key")
    assert(feed.inputFiles.nonEmpty && feed.inputFiles.forall(_.contains("/cdc/")),
      s"adjacent delete feed read outside cdc/: ${feed.inputFiles.toSeq}")
    assert(asSet(feed) == (1L to 40L).map(k => (k, k * 10)).toSet)
    assert(feed.select(col(ChangeFeed.ChangeType)).distinct()
      .as[String].collect().toSet == Set("delete"))
    // the persisted rows are bit-equal to what the diff derives: replay
    // still reconstructs the committed snapshot
    val replayed = applyStep(VersionedStore.readVersion(spark, path, v2), feed)
    assert(asSet(replayed) == asSet(VersionedStore.readVersion(spark, path, v3)))
    // a NON-adjacent pair must never shortcut through one commit's cdc
    val net = ChangeFeed.changesBetween(spark, path, v1, v3, "key")
    assert(net.inputFiles.forall(!_.contains("/cdc/")),
      "a gapped pair read a single commit's cdc relation")
    val netReplayed = applyStep(VersionedStore.readVersion(spark, path, v1), net)
    assert(asSet(netReplayed) == asSet(VersionedStore.readVersion(spark, path, v3)))
    // erasure law: once no diff base below the delete commit is
    // retained, vacuum reaps the cdc pre-images with the history
    VersionedStore.vacuum(spark, path, 1, claimGraceMs = 0L)
    assert(VersionedStore.cdcVersions(spark, path).isEmpty,
      "vacuum left a delete commit's cdc pre-images past the erasure window")
  }

  test("dv-bearing stores: no phantom deletes, dv-only replays no-op, " +
      "and a keyed re-upsert feeds as INSERT and resurrects the key") {
    val path = buildStore("dvmix")
    VersionedStore.deleteCommitDv(spark, path, Seq(10L).toDF("key"), "key")
    // a COW delete of {10, 20}: 10 is already vectored — the only
    // logical change is 20, and the cdc must agree with the diff
    VersionedStore.deleteCommit(spark, path,
      Seq(10L, 20L).toDF("key"), "key")
    val Seq(_, v2, v3) = VersionedStore.versions(spark, path)
    val d = ChangeFeed.changesBetween(spark, path, v2, v3, "key")
    assert(d.inputFiles.forall(_.contains("/cdc/")))
    assert(asSet(d) == Set((20L, 200L)),
      s"phantom delete for an already-vectored key: ${asSet(d)}")
    // a COW delete of ONLY vectored keys is a logical no-op: no commit
    VersionedStore.deleteCommit(spark, path, Seq(10L).toDF("key"), "key")
    assert(VersionedStore.versions(spark, path).last == v3,
      "a dv-only replay committed a spurious version")
    // keyed re-upsert of the vectored key: the feed classifies INSERT
    // (its pre-image is dv-erased, not a pre-image) and the key is
    // READABLE again at the tip — the PurgeSinkSpec re-onboarding
    // contract, carried to dv mode by the resurrection shrink
    graft.streaming.UpsertSink.upsertBatch(
      Seq((10L, 12345L)).toDF("key", "amount"), path, 1L, "key")
    val v4 = VersionedStore.versions(spark, path).last
    val u = ChangeFeed.changesBetween(spark, path, v3, v4, "key")
    assert(u.select(col(ChangeFeed.ChangeType)).as[String].collect().toSet ==
      Set("insert"))
    assert(asSet(u) == Set((10L, 12345L)))
    val tip = VersionedStore.readVersion(spark, path, v4)
    assert(tip.filter(col("key") === 10L)
      .select(col("amount")).as[Long].head() == 12345L,
      "the re-upserted key stayed invisible behind the old vector")
    // history is untouched: the key is still erased at v2/v3
    assert(VersionedStore.readVersion(spark, path, v3)
      .filter(col("key") === 10L).count() == 0)
    // replay law holds across the whole mixed lineage
    val replayed = applyStep(VersionedStore.readVersion(spark, path, v3), u)
    assert(asSet(replayed) == asSet(tip))
  }

  test("pure-dv store: a re-upsert whose OLD row still physically " +
      "exists feeds as INSERT, not an update pair") {
    val path = buildStore("dvres")
    VersionedStore.deleteCommitDv(spark, path, Seq(10L).toDF("key"), "key")
    graft.streaming.UpsertSink.upsertBatch(
      Seq((10L, 999L)).toDF("key", "amount"), path, 1L, "key")
    val Seq(_, v2, v3) = VersionedStore.versions(spark, path)
    val u = ChangeFeed.changesBetween(spark, path, v2, v3, "key")
    val byType = u.groupBy(col(ChangeFeed.ChangeType)).count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map("insert" -> 1L),
      s"dv-erased pre-image leaked into the classifier: $byType")
    assert(asSet(u) == Set((10L, 999L)))
    assert(VersionedStore.readVersion(spark, path, v3).count() == 800L)
    assert(VersionedStore.readVersion(spark, path, v2).count() == 799L)
  }

  test("a burned claim slot does not disable the cdc fast path") {
    val path = buildStore("burn")
    // a crashed writer's claim: slot 2 burns, the delete commits at 3
    VersionedStore.claimVersion(spark, path, 2)
    VersionedStore.deleteCommit(spark, path, (1L to 5L).toDF("key"), "key")
    val vs = VersionedStore.versions(spark, path)
    assert(vs == Seq(1, 3), s"expected a burned slot, got $vs")
    val feed = ChangeFeed.changesBetween(spark, path, 1, 3, "key")
    assert(feed.inputFiles.nonEmpty &&
      feed.inputFiles.forall(_.contains("/cdc/")),
      "retained-adjacent pair across a burned slot skipped the cdc")
    assert(asSet(feed) == (1L to 5L).map(k => (k, k * 10)).toSet)
  }

  test("upsert commits persist classified CDC: inserts and CHANGED-row " +
      "update pairs; identical-payload upserts feed nothing") {
    val path = Files.createTempDirectory("graft_cdf_ups").toString + "/store"
    graft.streaming.VersionedCommitSink.appendBatch(
      (1L to 100L).map(k => (k, k * 2)).toDF("k", "v"), path, 0L)
    graft.streaming.UpsertSink.upsertBatch(
      Seq((99L, 990L), (100L, 1000L), (101L, 202L), (102L, 204L))
        .toDF("k", "v"), path, 5L, "k")
    val Seq(v1, v2) = VersionedStore.versions(spark, path)
    val feed = ChangeFeed.changesBetween(spark, path, v1, v2, "k")
    assert(feed.inputFiles.nonEmpty &&
      feed.inputFiles.forall(_.contains("/cdc/")),
      s"upsert feed read outside cdc/: ${feed.inputFiles.toSeq}")
    val byType = feed.groupBy(col(ChangeFeed.ChangeType)).count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map("insert" -> 2L, "update_preimage" -> 2L,
      "update_postimage" -> 2L), s"got $byType")
    def vals(ct: String): Set[(Long, Long)] =
      feed.filter(col(ChangeFeed.ChangeType) === ct)
        .select(col("k"), col("v")).as[(Long, Long)].collect().toSet
    assert(vals("insert") == Set((101L, 202L), (102L, 204L)))
    assert(vals("update_preimage") == Set((99L, 198L), (100L, 200L)))
    assert(vals("update_postimage") == Set((99L, 990L), (100L, 1000L)))
    // an identical-payload upsert commits its rewrite but feeds NOTHING
    graft.streaming.UpsertSink.upsertBatch(
      Seq((50L, 100L)).toDF("k", "v"), path, 6L, "k")
    val v3 = VersionedStore.versions(spark, path).last
    assert(v3 > v2)
    assert(ChangeFeed.changesBetween(spark, path, v2, v3, "k").count() == 0,
      "an identical-payload upsert leaked change rows")
  }

  test("reader: watermark poll/commit with deterministic re-delivery") {
    val path = buildStore("rdr")
    val ckpt = Files.createTempDirectory("graft_cdf_ckpt").toString
    // current at v1: nothing to deliver
    assert(ChangeFeedReader.poll(spark, path, ckpt, "key").isEmpty)
    VersionedStore.appendCommit(spark, path,
      (801L to 810L).map(k => (k, k)).toDF("key", "amount"), "key", 1)
    val (f1, t1, d1) = ChangeFeedReader.poll(spark, path, ckpt, "key").get
    // crash before commit: the SAME interval re-delivers, bit-identical
    val (f2, t2, d2) = ChangeFeedReader.poll(spark, path, ckpt, "key").get
    assert((f1, t1) == (f2, t2) && asSet(d1) == asSet(d2))
    ChangeFeedReader.commit(spark, ckpt, t1)
    assert(ChangeFeedReader.poll(spark, path, ckpt, "key").isEmpty)
    // the next commit delivers only its own interval
    VersionedStore.deleteCommit(spark, path, Seq(801L).toDF("key"), "key")
    val (f3, t3, d3) = ChangeFeedReader.poll(spark, path, ckpt, "key").get
    assert(f3 == t1 && t3 > f3)
    assert(asSet(d3) == Set((801L, 801L)) &&
      d3.select(col(ChangeFeed.ChangeType)).as[String].collect().toSet ==
        Set("delete"))
    ChangeFeedReader.commit(spark, ckpt, t3)
    // superseded markers are swept: a long-lived consumer's checkpoint
    // listing stays one file, not one per interval forever
    val markers = new java.io.File(ckpt).list()
      .count(_.endsWith(".marker"))
    assert(markers == 1, s"commit left $markers markers behind")
    // a vacuumed watermark fails fast with the re-bootstrap contract
    VersionedStore.appendCommit(spark, path,
      Seq((901L, 901L)).toDF("key", "amount"), "key", 1)
    VersionedStore.vacuum(spark, path, 1, claimGraceMs = 0L)
    val ex = intercept[IllegalArgumentException] {
      ChangeFeedReader.poll(spark, path, ckpt, "key")
    }
    assert(ex.getMessage.contains("re-bootstrap"))
  }

  test("zero-file committed manifest: a purge that empties the store " +
      "still feeds, exports and prunes as EMPTY results, never throws") {
    val path = buildStore("empty")
    val vs0 = VersionedStore.versions(spark, path)
    // purge EVERY key: the delete commit's rewrite holds zero rows, so
    // the committed tip manifest can list zero files
    val v = VersionedStore.deleteCommit(spark, path,
      (1L to 800L).toDF("key"), "key")
    assert(v > vs0.last)
    assert(VersionedStore.readVersion(spark, path, v).count() == 0)
    // subject-access read over the emptied tip: empty, store-typed
    val ex = VersionedStore.readKeys(spark, path, v,
      Seq(5L).toDF("key"), "key")
    assert(ex.count() == 0)
    assert(ex.columns.toSet == Set("key", "amount"))
    // change feed across the emptying commit and a metadata-only pair
    val step = ChangeFeed.changesBetween(spark, path, vs0.last, v, "key")
    assert(step.filter(col(ChangeFeed.ChangeType) === "delete").count() == 800)
    // stats-pruned read over the emptied tip: empty, never NoSuchElement
    val pruned = sources.ColStats.readPruned(spark, path, v, "key")(
      (mn, mx) => mx >= 0L && mn <= 1000L)
    assert(pruned.count() == 0)
    assert(pruned.columns.toSet == Set("key", "amount"))
  }

  test("endpoint validation: uncommitted endpoints and a mismatched dv " +
      "key column fail with contract-stating messages") {
    val path = buildStore("val")
    VersionedStore.deleteCommitDv(spark, path, Seq(7L).toDF("key"), "key")
    val vs = VersionedStore.versions(spark, path)
    val e1 = intercept[IllegalArgumentException] {
      ChangeFeed.changesBetween(spark, path, vs.head, vs.last + 3, "key")
    }
    assert(e1.getMessage.contains("committed"))
    // the dv-term validation runs on the metadata-diff path — drop the
    // dv commit's write-path cdc relation to model a non-cdc writer
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      VersionedStore.cdcPath(path, vs.last)), true)
    val e2 = intercept[IllegalArgumentException] {
      ChangeFeed.changesBetween(spark, path, vs.head, vs.last, "amount")
    }
    assert(e2.getMessage.contains("deletion-vector column"))
  }

  test("bounded-plan union: a deep lineage's feed stays correct and its " +
      "plan holds chunk-count leaves, not one per commit") {
    val path = Files.createTempDirectory("graft_cdf_deep").toString + "/store"
    (0 until 40).foreach { i =>
      VersionedStore.appendCommit(spark, path,
        Seq((i.toLong, i.toLong * 10)).toDF("key", "amount"), "key", 1)
    }
    val vs = VersionedStore.versions(spark, path)
    assert(vs.size == 40)
    val all = ChangeFeed.changes(spark, path, vs.head, vs.last, "key")
    assert(all.count() == 39) // one insert per post-base commit
    assert(asSet(all.select(col("key"), col("amount"))) ==
      (1L until 40L).map(k => (k, k * 10)).toSet)
    // past ChunkSize steps, every chunk is a materialized checkpoint
    // leaf: the analyzed plan holds ceil(steps/ChunkSize) leaves, never
    // one scan per commit
    val leaves = all.queryExecution.analyzed.collectLeaves().size
    val chunks = (39 + ChangeFeed.ChunkSize - 1) / ChangeFeed.ChunkSize
    assert(leaves == chunks, s"deep feed plan has $leaves leaves, want $chunks")
  }

  test("schemaCarrier: a zero-file manifest resolves its schema from the " +
      "newest retained non-empty version; an always-empty store fails loudly") {
    val path = Files.createTempDirectory("graft_cdf_sc").toString + "/store"
    Seq((1L, "a")).toDF("key", "tag")
      .write.mode(SaveMode.Overwrite).parquet(VersionedStore.dataPath(path))
    val f1 = VersionedStore.hadoopLs(spark, VersionedStore.dataPath(path))
    VersionedStore.writeManifest(spark, path, 1, f1)
    VersionedStore.writeManifest(spark, path, 2, Nil)
    val sc = VersionedStore.schemaCarrier(spark, path, 2)
    assert(sc.count() == 0 && sc.columns.toSet == Set("key", "tag"))
    val bare = Files.createTempDirectory("graft_cdf_sc2").toString + "/store"
    VersionedStore.writeManifest(spark, bare, 1, Nil)
    val ex = intercept[IllegalStateException] {
      VersionedStore.schemaCarrier(spark, bare, 1)
    }
    assert(ex.getMessage.contains("undiscoverable"))
  }

  test("q120 gate: the lineage feed is non-empty and delete-complete") {
    val df = ChangeFeed.q120ChangeFeed(spark, TestSpark.sf)
    val rows = df.as[(Long, String, Long, Long, Long)].collect()
    assert(rows.map(r => (r._1, r._2)).toSeq ==
      Seq((2L, "insert"), (3L, "update_postimage"), (3L, "update_preimage"),
        (4L, "delete")))
    assert(rows.forall(_._3 > 0))
    val pre = rows.filter(_._2 == "update_preimage").head
    val post = rows.filter(_._2 == "update_postimage").head
    assert(post._3 == pre._3 && post._4 == pre._4 + 100L * pre._3,
      "post-image sum must be pre + 100 cents per updated row")
  }
}
