package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** KEY TOMBSTONES for the derived SERVING stores — the deletion-vector
  * idea applied to postings, code tables, cells and graph edges
  * (round-15 verdict #1): the versioned PRIMARY store already executes
  * erasure (q107b/q107c) and makes it physical at vacuum, but a subject
  * purged there stayed retrievable forever through the BM25 index, the
  * ANN stores and the kNN graph — none had a delete path. This module
  * is the shared verb:
  *
  *  - a store's tombstone relation is a small parquet side relation at
  *    `<storePath>.tombstones` holding one row per purged key (column
  *    `k`, plus store-specific payload — the inverted index carries the
  *    purged doc's length so corpus stats adjust exactly);
  *  - PURGE is an O(keys) append of the NEW keys only (idempotent:
  *    re-purging an already-tombstoned key appends nothing, so payload
  *    aggregates never double-subtract);
  *  - every PROBE anti-joins its candidates against the broadcast
  *    tombstone set — a purged key is unservable the moment the append
  *    lands, across every tier of the store (the logical-erasure SLA);
  *  - the FOLD (each store's optimize/vacuum point) rewrites exactly
  *    the files that can hold a tombstoned key — per-file key BLOOMS
  *    ([[KeyBloom]], written at build) prune the rewrite set, since a
  *    doc's postings scatter across term-clustered files where bands
  *    cannot prune — then clears the relation: after it no file holds
  *    a purged key's rows (the unrecoverability law, extended to the
  *    serving family).
  *
  * Purge batches are bounded driver material (the erasure-batch
  * contract shared with [[VersionedStore.deleteCommit]] and the SQL
  * `CALL graft_store_purge` literal list), so key sets ride `isin`
  * filters and driver-side membership checks.
  *
  * Reference anchor: the reference's serving store has exactly this
  * verb — SolrSupport.java:79-135 indexes into a collection with
  * delete-by-id semantics, and KuduDStreamFunctions.scala carries
  * delete ops; tombstone-then-fold is how an immutable-file layout
  * expresses them.
  */
object IndexTombstones {

  def dir(storePath: String): String = storePath + ".tombstones"

  def exists(s: SparkSession, storePath: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir(storePath))
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The raw tombstone relation (k + payload), deduplicated per key
    * (payload columns are deterministic functions of the key, so
    * max-resolution is exact, never arbitrary). None = never purged. */
  def read(s: SparkSession, storePath: String): Option[DataFrame] =
    if (!exists(s, storePath)) None
    else {
      val raw = s.read.parquet(dir(storePath))
      val payload = raw.columns.filterNot(_ == "k")
      Some(
        if (payload.isEmpty) raw.distinct()
        else raw.groupBy(col("k"))
          .agg(max(col(payload.head)).as(payload.head),
            payload.tail.map(c => max(col(c)).as(c)).toIndexedSeq: _*))
    }

  /** The purged-key set as bounded driver material — the graph walk's
    * and the isin-filter fold's input. Bounded by the erasure-batch
    * contract; [[foldable]] stores clear it at every fold. */
  def keySet(s: SparkSession, storePath: String): Set[Long] =
    read(s, storePath).fold(Set.empty[Long])(
      _.select(col("k")).collect().map(_.getLong(0)).toSet)

  /** Append the NEW rows of `rows` (column `k` + optional payload):
    * keys already tombstoned are skipped, so a replayed purge batch is
    * a no-op and payload sums stay exact. O(batch + tombstones). */
  def append(s: SparkSession, storePath: String, rows: DataFrame): Unit = {
    require(rows.columns.contains("k"),
      "tombstone rows must carry the purged key as column 'k'")
    val fresh = read(s, storePath) match {
      case None => rows
      case Some(have) =>
        rows.join(broadcast(have.select(col("k"))), Seq("k"), "left_anti")
    }
    // an all-absent / all-replayed batch appends NOTHING — it must not
    // create (or grow) the relation, or a replayed purge on a folded
    // store would leave a phantom tombstone dir behind
    if (!fresh.isEmpty)
      fresh.orderBy(col("k")).coalesce(1)
        .write.mode(SaveMode.Append).parquet(dir(storePath))
  }

  /** Drop the relation — the fold's last step, once no data file holds
    * a tombstoned key's rows. */
  def clear(s: SparkSession, storePath: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir(storePath))
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** Anti-join `df` against the store's tombstoned keys on `keyCol` —
    * the probe-side verb. A store never purged passes through (one
    * existence probe). The tombstone side is broadcast (erasure-batch
    * sized), so the anti-join rides the probe's existing scan. */
  def minus(s: SparkSession, storePath: String, df: DataFrame,
      keyCol: String): DataFrame =
    read(s, storePath) match {
      case None => df
      case Some(t) =>
        df.join(broadcast(t.select(col("k").as(keyCol))), Seq(keyCol),
          "left_anti")
    }

  /** Per-file key blooms for a serving relation's files — the fold's
    * prune input, written at build/merge time beside the relation (one
    * bounded scan of exactly `files`): `<rel>.keyblooms` rows of
    * (file, bloom) over `keyCol`. Term/tc/cell-clustered relations
    * scatter a key across files, so bands cannot prune the rewrite set;
    * blooms can (zero false negatives — [[KeyBloom]]). */
  def bloomsPath(rel: String): String = rel + ".keyblooms"

  def appendBlooms(s: SparkSession, rel: String, files: Seq[String],
      keyCol: String): Unit = appendBloomsMulti(s, rel, files, Seq(keyCol))

  /** Multi-column variant: ONE bloom per file over the union of the key
    * columns' values — the graph store's (src, dst) case, where a row
    * is purgeable through either endpoint. */
  def appendBloomsMulti(s: SparkSession, rel: String, files: Seq[String],
      keyCols: Seq[String]): Unit = {
    if (files.isEmpty) return
    import s.implicits._
    val rows = s.read.parquet(files: _*)
      .select(input_file_name().as("file"),
        explode(array(keyCols.map(c => col(c).cast("long")): _*)).as("kk"))
      .groupBy(col("file"))
      .agg(KeyBloom.bloomAgg(col("kk")).as("bloom"))
      .collect()
      .map(r => (VersionedStore.canon(r.getString(0)), r.getAs[Array[Byte]](1)))
    rows.sortBy(_._1).toSeq.toDF("file", "bloom")
      .coalesce(1).write.mode(SaveMode.Append).parquet(bloomsPath(rel))
  }

  private def readBlooms(s: SparkSession,
      rel: String): Map[String, Array[Byte]] = {
    val p = new org.apache.hadoop.fs.Path(bloomsPath(rel))
    if (!p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p))
      Map.empty
    else s.read.parquet(bloomsPath(rel)).dropDuplicates("file")
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
  }

  /** PHYSICAL FOLD of one manifest-listed relation: rewrite exactly the
    * files whose bloom admits a tombstoned key (a file without a bloom
    * fails open = rewritten), dropping the tombstoned rows; refresh the
    * relation's (file, mn, mx) manifest incrementally (surviving files
    * keep their rows, rewritten files get fresh `manifestKeyCol`
    * ranges); append blooms for the rewritten files; delete the
    * originals. Row order inside a rewritten file is PRESERVED (the
    * drop is a pure `isin` filter — no shuffle), so within-file sort
    * and row-group skip survive the fold.
    *
    * Returns the rewritten-file count — the fold-cost observable (the
    * smoke asserts it tracks the ADMITTED set, not the store).
    *
    * Crash discipline (the dv-fold rules): the manifest is the
    * authority — originals are deleted only after the new manifest is
    * durable, fold files land under attempt-unique names, and a fold
    * start reclaims any file the manifest no longer lists (a dead
    * attempt's orphans). Callers hold the store's maintenance lease and
    * clear the tombstone relation LAST, after every relation folded, so
    * a crash at any point leaves logical erasure (the probe anti-join)
    * in force. */
  def foldRelation(s: SparkSession, rel: String, manifestPath: String,
      keyCol: String, manifestKeyCol: String, keys: Set[Long]): Int =
    foldRelationMulti(s, rel, manifestPath, Seq(keyCol), manifestKeyCol, keys)

  /** Multi-column variant: a row is dropped when ANY of `keyCols` is
    * tombstoned (the graph store's src-or-dst rule); blooms are the
    * [[appendBloomsMulti]] union blooms. */
  def foldRelationMulti(s: SparkSession, rel: String, manifestPath: String,
      keyCols: Seq[String], manifestKeyCol: String, keys: Set[Long],
      finish: DataFrame => DataFrame = identity): Int = {
    if (keys.isEmpty) return 0
    import s.implicits._
    val fs = new org.apache.hadoop.fs.Path(rel)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    // manifests derived from input_file_name() carry URI-form names
    // (file:/...); canonicalize once so the heal diff, the bloom lookup
    // and the refreshed manifest all speak [[VersionedStore.canon]] form
    val mf = s.read.parquet(manifestPath).collect()
      .map(r => (VersionedStore.canon(r.getString(r.fieldIndex("file"))), r))
    val listed = mf.map(_._1).toSet
    // heal: reclaim files a dead attempt left unlisted in the manifest
    VersionedStore.hadoopLs(s, rel).filterNot(listed)
      .foreach(f => fs.delete(new org.apache.hadoop.fs.Path(f), true))
    val blooms = readBlooms(s, rel)
    val affected = mf.map(_._1).filter { f =>
      blooms.get(f) match {
        case Some(b) => keys.exists(k => KeyBloom.mightContain(b, k))
        case None => true // no bloom recorded: fail open, rewrite
      }
    }.sorted
    if (affected.isEmpty) return 0
    // attempt uniqueness must survive COMPLETED folds, whose stage dirs
    // are gone but whose fold_a<N>_<i>.parquet outputs persist in the
    // relation: resolve against both the live stage dirs and the fold
    // file names already present
    val FoldName = """fold_a(\d+)_\d+\.parquet""".r
    val usedByFiles = VersionedStore.hadoopLs(s, rel)
      .map(f => f.substring(f.lastIndexOf('/') + 1))
      .collect { case FoldName(a) => a.toInt }
    val attempt = {
      var a = if (usedByFiles.isEmpty) 0 else usedByFiles.max + 1
      while (fs.exists(new org.apache.hadoop.fs.Path(s"$rel/.fold_a$a"))) a += 1
      a
    }
    val stage = s"$rel/.fold_a$attempt"
    val keySeq = keys.toSeq.sorted
    val moved = affected.zipWithIndex.flatMap { case (f, i) =>
      val out = s"$stage/$i"
      // `finish` is the caller's per-file repair hook (e.g. the graph
      // store recomputes out-degrees, valid per-file under src
      // clustering); the default pure filter preserves row order
      val kept = finish(s.read.parquet(f)
        .filter(keyCols.map(c => !col(c).isin(keySeq: _*)).reduce(_ && _)))
      kept.coalesce(1).write.mode(SaveMode.Overwrite).parquet(out)
      val part = VersionedStore.hadoopLs(s, out)
      if (part.isEmpty || s.read.parquet(out).isEmpty) None
      else {
        val target = new org.apache.hadoop.fs.Path(
          s"$rel/fold_a${attempt}_$i.parquet")
        require(StoreIo.ops.rename(fs,
          new org.apache.hadoop.fs.Path(part.head), target),
          s"fold rename failed: ${part.head} -> $target")
        Some(VersionedStore.canon(target.toString))
      }
    }
    // fresh manifest rows for the rewritten files, surviving rows kept
    val newRows =
      if (moved.isEmpty) Seq.empty[(String, Any, Any)]
      else s.read.parquet(moved.toIndexedSeq: _*)
        .groupBy(input_file_name().as("file"))
        .agg(min(col(manifestKeyCol)).as("mn"), max(col(manifestKeyCol)).as("mx"))
        .collect().map(r =>
          (VersionedStore.canon(r.getString(0)), r.get(1), r.get(2))).toSeq
    val affectedSet = affected.toSet
    val keptRows = mf.filterNot(t => affectedSet(t._1))
      .map(t => (t._1, t._2.get(t._2.fieldIndex("mn")),
        t._2.get(t._2.fieldIndex("mx")))).toSeq
    val schema = s.read.parquet(manifestPath).select(
      col("file"), col("mn"), col("mx")).schema
    val rows = (keptRows ++ newRows).sortBy(_._1)
      .map(t => org.apache.spark.sql.Row(t._1, t._2, t._3))
    import scala.jdk.CollectionConverters._
    s.createDataFrame(rows.asJava, schema)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(manifestPath)
    appendBloomsMulti(s, rel, moved.toIndexedSeq, keyCols)
    affected.foreach(f => fs.delete(new org.apache.hadoop.fs.Path(f), true))
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    affected.length
  }
}
