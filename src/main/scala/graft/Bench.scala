package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Per-round benchmark: one warm-up pass (absorbs JVM/codegen/scan
  * warm-up), then one timed pass per query driven by a noop write (pays
  * full result production, unlike count() which can skip final work).
  * Emits ONE bare JSON line on stdout (build.sbt sets StdoutOutput so sbt
  * does not prefix it) and also writes it to bench_out.json.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Cache hygiene: several operators persist multi-pass intermediates;
    // dropping them between queries keeps measurements independent (no
    // cross-query cache reuse from the warm-up pass) and prevents cache
    // pressure from skewing later queries in the run.
    def runOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      spark.catalog.clearCache()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    // warm-up: every query once (also JIT-compiles shared scan/codegen paths)
    SparkEntry.queries.foreach { case (_, fn) =>
      try runOne(fn) catch { case _: Throwable => () }
    }
    // A query that throws must not read as a normal (fast) timing — it is
    // timed anyway but also listed under "errors" so a regression can't
    // masquerade as a speedup in the recorded bench.
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try runOne(fn) catch { case e: Throwable =>
        errors += name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try Files.writeString(Paths.get(out), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
