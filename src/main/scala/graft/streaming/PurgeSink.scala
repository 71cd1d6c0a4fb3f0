package graft.streaming

import graft.sources.VersionedStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** s20: STREAMING ERASURE EXECUTION — the sink that closes the
  * right-to-be-forgotten loop end to end: q107 SIZES a purge, s16
  * GATES new ingest against tombstones, [[graft.sources.VersionedStore
  * .deleteCommit]] EXECUTES one batch — this drives that execution
  * from a LIVE STREAM of erasure requests (the operational reality:
  * deletion requests arrive continuously and each must land within an
  * SLA, not wait for a nightly batch).
  *
  * Each micro-batch of keys becomes one copy-on-write DELETE commit:
  * owning files planned from the per-file key bands, rewritten minus
  * the batch's keys, everything else shared — per-trigger cost tracks
  * the ERASURE BATCH, never the store. Replay semantics are
  * IDEMPOTENT-BY-CONSTRUCTION rather than marker-gated: a replayed
  * batch's keys are already absent, so no file's band can own them and
  * the commit is a no-op returning the current tip (deleteCommit's
  * no-op path) — no duplicate version, no rewrite. The one sequencing
  * assumption is the store family's usual one: while the purge stream
  * is live, no OTHER writer re-inserts purged keys between a crash and
  * its replay (the claim protocol still serializes slot ownership if
  * one tries; the replay would then re-purge, which is the correct
  * outcome for an erasure).
  *
  * History stays readable until [[graft.sources.VersionedStore.vacuum]]
  * makes the erasure physical — run retention from the maintenance
  * schedule with the stream quiesced, exactly as compaction does.
  */
object PurgeSink {

  /** Execute one erasure batch. Returns the committed version, or None
    * when the batch was empty or nothing was newly purged (replay /
    * already-absent keys). `mode` picks the physical strategy:
    * "cow" (default) rewrites the owning files minus the keys —
    * per-trigger cost tracks the touched FILES; "dv" commits a
    * deletion-vector version ([[graft.sources.VersionedStore
    * .deleteCommitDv]]) — per-trigger cost tracks the KEYS (the
    * scattered-erasure regime), folded physical at the store's next
    * compaction or vacuum. Replay stays a no-op in both: dv mode's
    * presence check also subtracts keys the current dv already holds. */
  def purgeBatch(keys: DataFrame, storePath: String,
      keyCol: String, mode: String = "cow"): Option[Int] = {
    if (keys.isEmpty) return None
    val s = keys.sparkSession
    val before = VersionedStore.committedTip(s, storePath)
    val v = mode match {
      case "cow" => VersionedStore.deleteCommit(s, storePath, keys, keyCol)
      case "dv" => VersionedStore.deleteCommitDv(s, storePath, keys, keyCol)
      case other => throw new IllegalArgumentException(
        s"unknown purge mode '$other' (expected cow or dv)")
    }
    if (before.contains(v)) None else Some(v)
  }

  /** Attach the erasure executor to a stream of request keys. */
  def writeTo(keys: DataFrame, storePath: String, keyCol: String,
      checkpointDir: String, mode: String = "cow"): StreamingQuery =
    keys.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        purgeBatch(batch, storePath, keyCol, mode); ()
      }
      .start()
}
