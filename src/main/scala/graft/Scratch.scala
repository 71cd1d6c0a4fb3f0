package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain

/** Throwaway profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
    val s = builder.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    try {
      val df = Seq(1L, 2L, 3L, 100L).toDF("v")
      val agg = new BloomFilterAggregate(
        toExpression(xxhash64(col("v"))), Literal(1000L), Literal(8192L))
      val bf = df.agg(toColumn(agg.toAggregateExpression()).as("bf"))
      val probe = Seq(1L, 2L, 50L).toDF("v").crossJoin(bf)
        .select(col("v"),
          toColumn(BloomFilterMightContain(
            toExpression(col("bf")), toExpression(xxhash64(col("v"))))).as("hit"))
      probe.collect().foreach(r => println("PROBE " + r.getLong(0) + " -> " + r.getBoolean(1)))
      println("BLOOM OK")
    } catch { case e: Throwable => e.printStackTrace(); println("BLOOM FAIL: " + e.getMessage.take(300)) }
    s.stop()
  }
}
