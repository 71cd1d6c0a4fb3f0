package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named-table loader over the driver's parquet test layout.
  *
  * Reads are plain `spark.read.parquet` so Catalyst predicate pushdown
  * and column pruning reach the scan; callers select/filter lazily and
  * never cache (each query owns its scan).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")

  /** events with ts normalized: raw ns long → `ts_us` (long, floored like
    * DuckDB's parquet-ns read) and `tstamp` (TIMESTAMP at micros).
    * `div` truncates toward zero, which equals DuckDB's floor only for
    * post-epoch (>= 1970) timestamps — true for all driver testdata. */
  def eventsTs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    events(s, d)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("tstamp", timestamp_micros(col("ts_us")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
