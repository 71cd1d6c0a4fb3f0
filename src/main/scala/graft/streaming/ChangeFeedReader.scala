package graft.streaming

import graft.sources.{ChangeFeed, VersionedStore}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Checkpointed INCREMENTAL CONSUMER of a [[graft.sources.ChangeFeed]] —
  * the streaming read of a versioned store (Delta's streaming-table
  * source shape): a consumer polls for versions committed past its
  * watermark, processes exactly that interval's change rows, then
  * advances the watermark durably. Re-run forever under any scheduler
  * (Trigger.AvailableNow-style), it is the "streaming = repeated
  * incremental batch" equivalence the table formats implement natively.
  *
  * Delivery contract — AT-LEAST-ONCE with deterministic replay: the
  * watermark marker is created LAST (the house commit discipline —
  * [[UpsertSink]], [[VersionedCommitSink]]), so a crash between
  * processing and [[commit]] re-delivers the SAME committed interval,
  * bit-identical (the feed is a pure function of the immutable
  * lineage). A consumer keyed on `_commit_version` (every row carries
  * it) dedups re-delivery to exactly-once, the same way the sinks'
  * batch-id replay skip does.
  *
  * Scale shape: one `poll` costs one committed-version listing plus the
  * feed of the NEW interval only — an idle poll is metadata-only; the
  * driver state is a single integer watermark. Vacuum interaction: a
  * consumer lagging below retention loses its diff base; poll detects
  * the vacuumed watermark and fails fast with the recovery contract
  * (re-bootstrap from a retained snapshot) instead of silently skipping
  * commits.
  */
object ChangeFeedReader {

  private def dir(ckpt: String) = new org.apache.hadoop.fs.Path(ckpt)

  /** The durably consumed watermark: the newest `consumed_v<N>.marker`
    * under the checkpoint dir, None before the first [[commit]]. */
  def lastConsumed(s: SparkSession, ckpt: String): Option[Int] = {
    val p = dir(ckpt)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("consumed_v") && n.endsWith(".marker") =>
        n.stripPrefix("consumed_v").stripSuffix(".marker").toIntOption }
      .flatten.sorted.lastOption
  }

  /** One incremental step: the change rows of every version committed
    * past the watermark, or None when the consumer is current. A first
    * poll (no watermark yet) starts at the OLDEST retained version —
    * the tail-only bootstrap; a consumer that needs the initial content
    * too reads `readVersion(oldest)` as its snapshot and treats this
    * feed as the tail (the Delta startingVersion contract). */
  def poll(s: SparkSession, path: String, ckpt: String,
      keyCol: String): Option[(Int, Int, DataFrame)] = {
    val vs = VersionedStore.versions(s, path)
    require(vs.nonEmpty, s"no committed versions under $path")
    val from = lastConsumed(s, ckpt) match {
      case None => vs.head
      case Some(w) =>
        require(vs.contains(w),
          s"consumed watermark v$w was vacuumed below retention " +
            s"(oldest retained: v${vs.head}) — re-bootstrap from a " +
            "retained snapshot and a fresh checkpoint")
        w
    }
    val tip = vs.last
    if (tip <= from) None
    else Some((from, tip, ChangeFeed.changes(s, path, from, tip, keyCol)))
  }

  /** Durably advance the watermark — call ONLY after the polled
    * interval is fully handled downstream; marker creation is the
    * commit point (atomic create, newest wins). Superseded markers are
    * deleted AFTER the new one is durable (only the newest is ever
    * read, and a crash between the create and the sweep merely leaves
    * extras the next commit removes) — without the sweep a long-lived
    * consumer's checkpoint listing grows one file per interval forever. */
  def commit(s: SparkSession, ckpt: String, toV: Int): Unit = {
    val p = dir(ckpt)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.mkdirs(p)
    graft.sources.StoreIo.ops.createMarker(fs,
      new org.apache.hadoop.fs.Path(p, s"consumed_v$toV.marker"))
    fs.listStatus(p).toSeq.map(_.getPath)
      .filter { q =>
        val n = q.getName
        n.startsWith("consumed_v") && n.endsWith(".marker") &&
          n.stripPrefix("consumed_v").stripSuffix(".marker")
            .toIntOption.exists(_ < toV)
      }
      .foreach(q => fs.delete(q, false))
  }
}
