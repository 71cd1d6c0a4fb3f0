package graft.streaming

import graft.streaming.Streams.EntityUpdate
import org.apache.spark.sql.{Dataset, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery}

/** Keyed upsert sink: the store side of ingest→process→store.
  *
  * Reference origin: ny_taxi/NyTaxiYellowTripStreaming.scala:214-266
  * sendEntityToKudu (newInsert for New, newUpdate for Modified) and the
  * kudu client session around it. Kudu is replaced by a parquet "store"
  * directory maintained through Structured Streaming's foreachBatch:
  * every micro-batch's entity updates are merged into the store by key,
  * newest state wins (the stream emits full merged entities, so the merge
  * is a keyed replace — idempotent per batch, safe under foreachBatch's
  * at-least-once replay).
  *
  * At scale the store write would target a table format with real upsert
  * (the merge below is the same plan those formats run: full-outer keyed
  * anti/replace). The store is re-written per batch here because plain
  * parquet has no row-level update — the merge itself is the operator
  * under test.
  */
object UpsertSink {

  /** Merge one micro-batch of entity updates into the parquet store. */
  def mergeBatch(batch: Dataset[EntityUpdate], storeDir: String): Unit = {
    val spark = batch.sparkSession
    val incoming = batch.toDF()
      .select(col("custkey"), col("totalTrips"), col("totalAmount"),
        col("maxAmount"), col("openTrips"), col("fulfilledTrips"))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(storeDir)
    val old = new org.apache.hadoop.fs.Path(storeDir + "_old")
    // Crash recovery: a previous run may have died between the two swap
    // renames below, leaving the store only at _old. Restore it first.
    if (!fs.exists(dst) && fs.exists(old))
      require(fs.rename(old, dst), s"restore rename $old -> $dst failed")
    // Only a genuinely-missing store means "first batch". Any other read
    // failure (transient FS error, corrupt footer) must propagate: treating
    // it as first-batch would merge incoming-only and discard every stored
    // key on the swap below.
    val existing = if (fs.exists(dst)) spark.read.parquet(storeDir) else null
    val merged =
      if (existing == null) incoming
      else existing.join(incoming.select(col("custkey")).distinct(),
          Seq("custkey"), "left_anti") // keep untouched keys
        .unionByName(incoming)         // replace touched keys with new state
    // write to a tmp dir then swap: the source of the read above must not
    // be clobbered mid-job. coalesce(1) is demo-store sizing only — a
    // production store keeps its partitioning (or a real upsert format).
    val tmp = new org.apache.hadoop.fs.Path(storeDir + "_tmp")
    merged.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // Promote by renaming the current store aside first, so no point in
    // time has zero copies: a crash leaves either dst or _old readable
    // (foreachBatch replays the batch; the merge is idempotent).
    // Hadoop rename/delete signal failure by returning false, not by
    // throwing — check each result so a failed swap fails the batch and
    // streaming replays it, instead of completing with a stale store.
    fs.delete(old, true)
    if (fs.exists(dst))
      require(fs.rename(dst, old), s"rename $dst -> $old failed")
    require(fs.rename(tmp, dst), s"rename $tmp -> $dst failed")
    fs.delete(old, true)
  }

  /** Attach the upsert sink to an entity-update stream. */
  def writeTo(updates: Dataset[EntityUpdate], storeDir: String,
      checkpointDir: String): StreamingQuery = {
    val w: DataStreamWriter[EntityUpdate] = updates.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: Dataset[EntityUpdate], _: Long) =>
        mergeBatch(batch, storeDir))
    w.start()
  }
}
