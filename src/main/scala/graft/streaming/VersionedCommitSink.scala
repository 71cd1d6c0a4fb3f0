package graft.streaming

import graft.sources.VersionedStore
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming APPEND COMMITS into the versioned store — the bridge
  * between the engine's two write-side stories: [[UpsertSink]] keeps a
  * CURRENT-state table (the reference's Kudu upsert path, history
  * destroyed) and [[graft.sources.VersionedStore]] keeps replayable
  * history for batch commits; this sink gives the STREAM the second
  * behavior. Every micro-batch becomes one immutable version commit:
  *
  *  - the batch's rows land as new files in the batch's OWN data
  *    directory (Overwrite — a replayed batch reproduces the same
  *    files instead of appending duplicates);
  *  - the new manifest = parent manifest + the batch's files (the
  *    O(delta) append commit; no data rewritten, parent versions
  *    untouched and time-travel readable through the SAME
  *    [[VersionedStore.readVersion]] layout);
  *  - a TXN record mapping batchId → version commits LAST (its
  *    _SUCCESS marker is the commit, the Delta txn-action idea): a
  *    checkpoint-replayed batch id found in the committed txn set is
  *    SKIPPED — no duplicate version, no duplicate rows — and a crash
  *    between manifest and txn leaves an uncommitted version the next
  *    attempt simply overwrites.
  *
  * Downstream, the batch machinery applies unchanged: q109-style time
  * travel across stream commits, q110's O(delta) view maintenance off
  * any manifest diff, and [[VersionedStore.vacuum]] for retention.
  */
object VersionedCommitSink {

  def txnDir(path: String): String = path + "/txn"
  def txnPath(path: String, v: Int): String = txnDir(path) + s"/v$v"
  private def batchDataDir(path: String, batchId: Long): String =
    path + s"/data/batch_$batchId"

  /** Versions whose txn record carries _SUCCESS — the committed set
    * (a manifest without its txn is an uncommitted leftover). */
  def committedVersions(s: SparkSession, path: String): Seq[Int] = {
    val p = new Path(txnDir(path))
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") => n.drop(1).toIntOption }
      .flatten
      .filter(v => fs.exists(new Path(s"${txnPath(path, v)}/_SUCCESS")))
      .sorted
  }

  /** batchId → version for every committed txn (bounded by version
    * count — one 1-row parquet read per version). */
  def committedBatchIds(s: SparkSession, path: String): Map[Long, Int] =
    committedVersions(s, path).map { v =>
      s.read.parquet(txnPath(path, v)).head().getLong(0) -> v
    }.toMap

  /** Commit one micro-batch as the next version. Returns the committed
    * version, or None when the batch was empty or already committed. */
  def appendBatch(batch: DataFrame, path: String, batchId: Long): Option[Int] = {
    if (batch.isEmpty) return None
    val s = batch.sparkSession
    if (committedBatchIds(s, path).contains(batchId)) return None
    val versions = committedVersions(s, path)
    val v = versions.lastOption.getOrElse(0) + 1
    val dataDir = batchDataDir(path, batchId)
    batch.write.mode(SaveMode.Overwrite).parquet(dataDir)
    val newFiles = VersionedStore.hadoopLs(s, dataDir)
    val parent = versions.lastOption
      .map(pv => VersionedStore.versionFiles(s, path, pv).toSet)
      .getOrElse(Set.empty[String])
    VersionedStore.writeManifest(s, path, v, parent ++ newFiles)
    // txn LAST: its _SUCCESS is the commit
    import s.implicits._
    Seq(batchId).toDF("batch_id")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(txnPath(path, v))
    Some(v)
  }

  /** Maintain the versioned table from a stream. */
  def writeTo(rows: DataFrame, path: String,
      checkpointDir: String): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, path, batchId); ()
      }
      .start()
}
