package graft
import org.apache.spark.sql.SparkSession

/** Throwaway profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
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
    time("warmup count")(Tables.documents(s, dir).count())
    val exact = operators.Similarity.q50KnnBrute(s, dir)
      .collect().map(_.getLong(0)).toSet
    val meta = {
      val p = sources.KnnGraphStore.store(s, dir)
      s.read.parquet(sources.KnnGraphStore.layersMetaPath(p)).head().getInt(0)
    }
    println(s"[scratch] maxLayer=$meta")
    (1 to 3).foreach { i =>
      s.catalog.clearCache()
      time(s"q96d layered run$i") {
        val (best, hops) = sources.KnnGraphStore.graphProbeDetailed(
          s, dir, k = 10, beam = 8, maxHops = 32)
        val rec = (exact & best.map(_._1).toSet).size.toDouble / exact.size
        println(s"[scratch] layered hops=$hops recall=$rec")
      }
      time(s"q96d flat run$i") {
        val p = sources.KnnGraphStore.store(s, dir)
        val sc = sources.KnnGraphStore.dirScorer(s, dir)
        val (best, hops) = sources.KnnGraphStore.probeFlat(
          s, p, sc, k = 10, beam = 8, maxHops = 32, ef = 48)
        val rec = (exact & best.map(_._1).toSet).size.toDouble / exact.size
        println(s"[scratch] flat hops=$hops recall=$rec")
      }
    }
    s.stop()
  }
}
