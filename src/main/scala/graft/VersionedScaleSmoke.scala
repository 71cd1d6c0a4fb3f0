package graft

import graft.sources.VersionedStore
import org.apache.spark.sql.functions._

/** Versioned-store scale smoke (round-14 verdict #7): the dedup/ANN
  * families carry 16x/64x evidence, but the store SERVICES — the dv
  * erasure commit and the maintained-MV refresh — had 1x and 10x
  * evidence only. This drives both at a 1x and an Rx (default 64x)
  * events-axis store and measures the two walls the design pins:
  *
  *  - **dv commit ∝ batch**: a FIXED 500-key scattered erasure against
  *    a 64x-bigger store must cost ~the same wall (the commit writes
  *    O(keys) dv bytes + a band manifest copy; the presence check reads
  *    only the bloom-admitted owning files). The one O(store) cost —
  *    the first-call blooms heal — is amortized store metadata, timed
  *    separately as `heal_s`, exactly like a table format's first
  *    statistics pass.
  *  - **MV refresh ∝ delta**: after a FIXED 10k-row append, refreshMv
  *    must scan only the delta files — same wall at 64x store size.
  *
  * This is a harness main, not a gated query: it puts numbers behind
  * the q107c/q110d scale claims. One JSON line per scale point.
  *
  * `sbt "runMain graft.VersionedScaleSmoke [replicas]"` (default 64).
  */
object VersionedScaleSmoke {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.session(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val baseRows = 50000L
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    Seq(1, replicas).foreach { rep =>
      val n = baseRows * rep
      val path = s"/tmp/graft_vsmoke_${rep}x/store"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"/tmp/graft_vsmoke_${rep}x"), true)
      // the store: key-clustered files whose COUNT grows with the data
      // (8 per base unit) — the layout a stream of appends yields
      val batch = spark.range(1L, n + 1L)
        .select(col("id").as("k"), (col("id") % 97).as("g"),
          (col("id") * 3).as("v"))
        .repartitionByRange(8 * rep, col("k"))
        .sortWithinPartitions("k")
      graft.streaming.VersionedCommitSink.appendBatch(batch, path, 0L)

      // one-time blooms heal, timed separately (amortized store metadata)
      val (_, healS) = time {
        VersionedStore.deleteCommitDv(spark, path,
          Seq(-1L).toDF("k"), "k") // absent key: heals blooms, commits nothing
      }

      // FIXED-SIZE scattered erasure: 500 keys spread over the whole key
      // range — the batch is the same at both scales, the store is not
      val stride = math.max(1L, n / 500L)
      val purge = (1L to n by stride).take(500).toSeq
      val ((dvV), dvS) = time {
        VersionedStore.deleteCommitDv(spark, path, purge.toDF("k"), "k",
          autoFoldFraction = 0.0)
      }
      val dvBytes = {
        val p = new org.apache.hadoop.fs.Path(VersionedStore.dvPath(path, dvV))
        if (fs.exists(p)) fs.getContentSummary(p).getLength else -1L
      }

      // change feed of the dv commit: 500 deletes read from only the
      // bloom-admitted owning files — wall must track the BATCH
      val dvParent = VersionedStore.versions(spark, path).filter(_ < dvV).last
      val (dvFeedN, feedDvS) = time {
        graft.sources.ChangeFeed
          .changesBetween(spark, path, dvParent, dvV, "k").count()
      }
      require(dvFeedN == 500L, s"rep=$rep: dv feed emitted $dvFeedN rows")

      // maintained MV: initialize at the current tip (full compute,
      // excluded), then time the refresh across a FIXED 10k-row append
      VersionedStore.refreshMv(spark, path, "g", "v", "k")
      graft.streaming.VersionedCommitSink.appendBatch(
        spark.range(n + 1L, n + 10001L)
          .select(col("id").as("k"), (col("id") % 97).as("g"),
            (col("id") * 3).as("v"))
          .repartitionByRange(2, col("k")).sortWithinPartitions("k"),
        path, 1L)
      val (range, refS) = time {
        VersionedStore.refreshMv(spark, path, "g", "v", "k")
      }

      // change feed of the append commit: reads only the delta files
      val tipNow = VersionedStore.versions(spark, path).last
      val (apFeedN, feedApS) = time {
        graft.sources.ChangeFeed
          .changesBetween(spark, path, dvV, tipNow, "k").count()
      }
      require(apFeedN == 10000L, s"rep=$rep: append feed emitted $apFeedN rows")

      // subject-access read: a FIXED 100-key export against the tip —
      // the bloom-pruned point read vs the naive full-scan semi-join
      val sarKeys = (1L to n by math.max(1L, n / 100L)).take(100).toSeq
      val (sarN, sarS) = time {
        VersionedStore.readKeys(spark, path, tipNow,
          sarKeys.toDF("k"), "k").count()
      }
      val (scanN, scanS) = time {
        VersionedStore.readVersion(spark, path, tipNow)
          .join(sarKeys.toDF("k"), Seq("k"), "left_semi").count()
      }
      require(sarN == scanN, s"rep=$rep: readKeys $sarN != scan $scanN")

      // sanity: the refreshed MV equals a full recompute of the tip
      val tip = VersionedStore.versions(spark, path).last
      val full = VersionedStore.readVersion(spark, path, tip)
        .groupBy(col("g"))
        .agg(count(lit(1)).as("cnt"), sum(col("v")).as("total"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      val mv = VersionedStore.readMv(spark, path)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      require(mv == full, s"rep=$rep: refreshed MV diverged from recompute")

      println(f"""{"smoke":"versioned_scale","rep":$rep,"rows":$n,""" +
        f""""heal_s":$healS%.3f,"dv_commit_s":$dvS%.3f,""" +
        f""""dv_bytes":$dvBytes,"refresh_s":$refS%.3f,""" +
        f""""refresh_range":[${range._1},${range._2}],""" +
        f""""feed_dv_s":$feedDvS%.3f,"feed_append_s":$feedApS%.3f,""" +
        f""""sar_keys":${sarKeys.size},"sar_s":$sarS%.3f,""" +
        f""""sar_scan_s":$scanS%.3f}""")
    }
    spark.stop()
  }
}
