package graft

import graft.sources.VersionedStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** MULTI-WRITER COMMIT-THROUGHPUT smoke (round-16 verdict #6): the
  * claim protocol serializes COMMITS per store by construction — this
  * measures what that costs with N writers live at once, and proves
  * lineage integrity under the contention the spec suite can only
  * sample.
  *
  *  - APPEND phase: N concurrent appenders × M commits each. An append
  *    never replans (its data files don't depend on the parent's
  *    content): each writer claims a slot, writes its files ONCE, and
  *    settles until every lower slot resolves — so data writes overlap
  *    and only the manifest chain serializes. Reported: wall, commits/s,
  *    and burned slots (claimed, never committed — 0 expected).
  *  - UPSERT phase: N concurrent COW writers × M commits over disjoint
  *    key ranges. A loser's rewrite is computed against a stale parent,
  *    so it burns its slot and replans — the RETRY count is the
  *    protocol's contention price, visible as claimed-but-uncommitted
  *    slots. Reported: wall, commits/s, retries.
  *
  * Integrity assertions (both phases): the committed version sequence
  * is gapless, the tip's content equals the union of every writer's
  * batches, and requireNoLineageGap held on every commit (it throws in
  * the writer otherwise).
  *
  * `sbt "runMain graft.ConcurrentWriteSmoke [writers] [commits]"`
  * (defaults 4 × 25). One JSON line per phase.
  */
object ConcurrentWriteSmoke {
  def main(args: Array[String]): Unit = {
    val writers = args.headOption.map(_.toInt).getOrElse(4)
    val commits = args.lift(1).map(_.toInt).getOrElse(25)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = Engine.session(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def withThreads[A](n: Int)(f: Int => A): Seq[A] = {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      Await.result(
        Future.sequence((0 until n).map(w => Future(f(w)))), Duration.Inf)
    }

    def burnedSlots(path: String): Int = {
      val p = new org.apache.hadoop.fs.Path(path + "/claims")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) 0
      else {
        val claimed = fs.listStatus(p).map(_.getPath.getName)
          .flatMap(n => n.stripPrefix("v").toIntOption).toSet
        (claimed -- VersionedStore.versions(spark, path).toSet).size
      }
    }

    // ---- APPEND phase ----
    locally {
      val path = "/tmp/graft_cwsmoke/append"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val t0 = System.nanoTime()
      withThreads(writers) { w =>
        (0 until commits).foreach { i =>
          val base = (w.toLong * commits + i) * 1000L
          VersionedStore.appendCommit(spark,
            path, (base until base + 100L).map(k => (k, k * 2))
              .toDF("k", "v"), "k", 1)
        }
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val vs = VersionedStore.versions(spark, path)
      val total = writers * commits
      require(vs == (1 to total), s"append lineage has gaps: $vs")
      val rows = VersionedStore.readVersion(spark, path, total).count()
      require(rows == total * 100L, s"tip lost rows: $rows")
      println(f"""{"smoke":"concurrent_write","phase":"append",""" +
        f""""writers":$writers,"commits":$total,"wall_s":$wall%.2f,""" +
        f""""commits_per_s":${total / wall}%.2f,""" +
        f""""burned_slots":${burnedSlots(path)}}""")
    }

    // ---- UPSERT (COW) phase ----
    locally {
      val path = "/tmp/graft_cwsmoke/upsert"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val upserts = math.max(1, commits / 2)
      val t0 = System.nanoTime()
      withThreads(writers) { w =>
        (0 until upserts).foreach { i =>
          val base = w.toLong * 1000000L
          graft.streaming.UpsertSink.upsertBatch(
            (base until base + 200L).map(k => (k, i.toLong)).toDF("k", "v"),
            path, w.toLong * 10000L + i, "k",
            settleTimeoutMs = 120000L)
        }
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val total = writers * upserts
      val vs = VersionedStore.versions(spark, path)
      val tip = VersionedStore.readVersion(spark, path, vs.max)
      // every writer's LAST upsert wins its range: 200 keys per writer
      val got = tip.groupBy((col("k") / 1000000L).cast("int").as("w"))
        .agg(count(lit(1)).as("n"), max(col("v")).as("last"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val want = (0 until writers)
        .map(w => (w, 200L, (upserts - 1).toLong)).toSet
      require(got == want, s"upsert tip diverged: $got vs $want")
      println(f"""{"smoke":"concurrent_write","phase":"upsert",""" +
        f""""writers":$writers,"commits":$total,""" +
        f""""committed_versions":${vs.size},"wall_s":$wall%.2f,""" +
        f""""commits_per_s":${total / wall}%.2f,""" +
        f""""retries":${burnedSlots(path)}}""")
    }
    spark.stop()
  }
}
