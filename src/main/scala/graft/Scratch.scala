package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Throwaway profiling harness (not part of the driver contract).
  *
  * `sbt "runMain graft.Scratch <queryKey>..."` times each named query
  * with the bench's noop-write methodology and prints a per-query
  * scheduler/compute breakdown: #jobs, #stages, #tasks, summed task
  * time, and the wall — so an overhead-bound query (wall >> taskTime /
  * cores) is distinguishable from a compute-bound one. Env knobs:
  * SCRATCH_SF_DIR (default sf0.1), SCRATCH_CPUS (default 32),
  * SCRATCH_PASSES (default 2; breakdown printed for the LAST pass). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SCRATCH_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SCRATCH_CPUS", "32")
    val passes = sys.env.getOrElse("SCRATCH_PASSES", "2").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    val s = Engine.localScratchDir.fold(builder)(d => builder.config("spark.local.dir", d))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    // Ad-hoc conf overrides for A/B runs: SCRATCH_SET="key=value;key=value"
    sys.env.get("SCRATCH_SET").foreach(_.split(";").map(_.trim).filter(_.nonEmpty)
      .foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) =>
            s.conf.set(k, v)
            println(s"[scratch] set $k=$v")
          case _ => println(s"[scratch] skipping malformed SCRATCH_SET entry: $kv")
        }
      })
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val taskNs = new AtomicLong
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(st: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskNs.addAndGet(
          (t.taskInfo.finishTime - t.taskInfo.launchTime) * 1000000L)
      }
    })
    val keys = if (args.nonEmpty) args.toSeq else Seq("q1_rollup_measures")
    println(f"${"query"}%-28s ${"pass"}%4s ${"wall_s"}%8s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"task_s"}%8s")
    keys.foreach { k =>
      val fn = SparkEntry.queries(k)
      (1 to passes).foreach { p =>
        s.catalog.clearCache()
        jobs.set(0); stages.set(0); tasks.set(0); taskNs.set(0L)
        val t0 = System.nanoTime()
        fn(s, dir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events are async; give the bus a moment on the last pass
        Thread.sleep(200)
        println(f"$k%-28s $p%4d $wall%8.3f ${jobs.get}%5d ${stages.get}%6d ${tasks.get}%6d ${taskNs.get / 1e9}%8.2f")
      }
    }
    s.stop()
  }
}
