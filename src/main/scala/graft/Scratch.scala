package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.TextOps

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
      .config("spark.ui.enabled", "false")
    val s = Engine.localScratchDir.fold(builder)(d => builder.config("spark.local.dir", d))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    val docTokens = TextOps.toks(lower(col("text")))
    def base = {
      val h = TextOps.polyHash61(concat(lit("split-salt-"), col("doc_id").cast("string")))
      Tables.documents(s, dir)
        .select(col("doc_id"), docTokens.as("tk"),
          when(pmod(h, lit(100L)) < 80, "train").otherwise("val").as("split"))
        .select(col("doc_id"), col("split"), TextOps.shingles3(col("tk")).as("shRaw"))
        .select(col("doc_id"), col("split"), array_distinct(col("shRaw")).as("sh"))
    }
    // warm-up
    time("warmup base.count")(base.count())
    time("base noop")(base.write.format("noop").mode("overwrite").save())
    val ex0 = base.select(col("doc_id"), col("split"), explode(col("sh")).as("g"))
    time("explode noop")(ex0.write.format("noop").mode("overwrite").save())
    val ex = ex0.persist(StorageLevel.MEMORY_AND_DISK)
    time("persist ex")(ex.count())
    val trainG = ex.filter(col("split") === "train").select(col("g")).distinct()
    time("trainG distinct")(trainG.write.format("noop").mode("overwrite").save())
    val hits = ex.filter(col("split") === "val")
      .join(trainG, Seq("g"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
    time("hits semi-join")(hits.write.format("noop").mode("overwrite").save())
    val fin = base.filter(col("split") === "val").filter(size(col("sh")) > 0)
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
    time("final join")(fin.write.format("noop").mode("overwrite").save())
    time("full q66")(operators.Dedup.q66NgramDecontam(s, dir)
      .write.format("noop").mode("overwrite").save())
    s.stop()
  }
}
