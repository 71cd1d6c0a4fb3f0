package graft

/** Plan-audit utility: `sbt "runMain graft.Explain <queryKey>..."` prints
  * the formatted physical plan of each named query (PLANS.md is produced
  * from this). */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[4]", 4)
    val dir = "/root/testdata/sf0.001"
    args.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
