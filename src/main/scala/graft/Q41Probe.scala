package graft
// TEMPORARY probe for q41 stage timing — not part of the driver contract;
// deleted before round end.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Q41Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SCRATCH_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SCRATCH_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        Engine.aqeMinPartitionSize)
      .config("spark.ui.enabled", "false")
    val s = Engine.localScratchDir.fold(builder)(d => builder.config("spark.local.dir", d))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import graft.functions.TextOps
    val jacT = 0.6

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    def shingleSets: DataFrame =
      Tables.documentsBalanced(s, dir)
        .select(col("doc_id"), TextOps.toks(lower(col("text"))).as("tk"))
        .select(col("doc_id"), TextOps.shingles3(col("tk")).as("shRaw"))
        .select(col("doc_id"),
          array_sort(array_distinct(transform(col("shRaw"), g => xxhash64(g)))).as("sh"))
        .withColumn("n", size(col("sh")).cast("long"))

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    (1 to 2).foreach { pass =>
      println(s"=== pass $pass ===")
      s.catalog.clearCache()
      val dg = Tables.documents(s, dir)
        .select(col("doc_id"), md5(col("text")).as("dg"))
      val reps0 = dg.groupBy(col("dg")).agg(min(col("doc_id")).as("rep_id"))
      val groups = dg.join(reps0, "dg").select(col("doc_id"), col("rep_id"))
        .persist()
      time("digestGroups")(noop(groups))
      val reps = groups.filter(col("doc_id") === col("rep_id")).select(col("doc_id"))
      val d = shingleSets.join(reps, Seq("doc_id"), "left_semi").persist()
      time("repShingleSets")(noop(d))
      val ex = d.select(col("doc_id"), explode(col("sh")).as("s"))
      val dfreq = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
      time("dfreq")(noop(dfreq))
      val prefix = ex.join(dfreq, "s")
        .groupBy(col("doc_id"))
        .agg(array_sort(collect_list(struct(col("df"), col("s")))).as("ranked"))
        .select(col("doc_id"), size(col("ranked")).cast("long").as("n"),
          expr(s"slice(ranked, 1, cast(floor((1.0 - $jacT) * size(ranked)) as int) + 1)")
            .as("pref"))
        .select(col("doc_id"), col("n"), posexplode(col("pref")).as(Seq("pos", "p")))
        .select(col("doc_id"), col("n"), (col("pos") + 1).cast("long").as("pos"),
          col("p.s").as("s"))
        .persist()
      time("prefix build")(noop(prefix))
      println("[probe] prefix rows: " + prefix.count())
      val alpha = ceil(lit(jacT / (1 + jacT)) * (col("a.n") + col("b.n")))
      val candRaw = prefix.as("a").join(prefix.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
            least(col("a.n"), col("b.n")).cast("double") >=
              lit(jacT) * greatest(col("a.n"), col("b.n")) &&
            (lit(1L) + least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos"))) >= alpha)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      val cand = candRaw.distinct().persist()
      time("cand self-join+distinct")(noop(cand))
      println("[probe] cand pairs: " + cand.count())
      val verify = cand
        .join(d.select(col("doc_id"), col("sh").as("sh_a"), col("n").as("na")),
          col("id_a") === col("doc_id")).drop("doc_id")
        .join(d.select(col("doc_id"), col("sh").as("sh_b"), col("n").as("nb")),
          col("id_b") === col("doc_id")).drop("doc_id")
        .withColumn("common",
          org.apache.spark.sql.GraftSqlBridge.toColumn(
            graft.functions.SortedIntersectCount(
              org.apache.spark.sql.GraftSqlBridge.toExpression(col("sh_a")),
              org.apache.spark.sql.GraftSqlBridge.toExpression(col("sh_b")))))
        .select(col("id_a"), col("id_b"),
          (col("common").cast("double") / (col("na") + col("nb") - col("common"))).as("jac"))
        .filter(col("jac") >= jacT)
      time("verify")(noop(verify))
      s.catalog.clearCache()
      val full = operators.Dedup.q41DedupNgramJaccard(s, dir)
      time("FULL q41")(noop(full))
    }
    s.stop()
  }
}
