package graft
import org.apache.spark.sql.SparkSession

/** Throwaway profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    val s = Engine.localScratchDir.fold(builder)(d => builder.config("spark.local.dir", d))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    time("q125 purge string") {
      sources.VersionedStore.q125PurgeString(s, dir).show(10, false)
    }
    time("q126 export string") {
      sources.VersionedStore.q126ExportString(s, dir).show(5, false)
    }
    s.stop()
  }
}
