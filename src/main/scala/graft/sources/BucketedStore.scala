package graft.sources

import graft.{Num, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed parquet tables — the co-located join side of the store
  * layout ([[PartitionedStore]] is the pruning side).
  *
  * Reference origin: the Kudu DDLs hash-partition every table by its
  * primary key into tablets, so a key-equi join between two tables
  * partitioned the same way never re-distributes rows. The Spark-native
  * equivalent is `bucketBy(n, key)` at write time: both sides of a
  * fact⋈fact join land pre-hashed into the same bucket space, and the
  * join planner satisfies its clustering requirement from the scan
  * itself — ZERO Exchange in the join stage (BucketedStoreSpec asserts
  * this on the executed plan).
  *
  * Why this matters at 100 TB: orders⋈lineitem is the join that cannot
  * broadcast (both sides are facts). Unbucketed, every run of every
  * downstream query pays a full shuffle of both tables; bucketed, the
  * shuffle is paid ONCE at ingest and amortized over every subsequent
  * join, aggregation keyed on the bucket column, or incremental merge.
  * The bucket count is the scale knob: it fixes maximum join
  * parallelism, so a real deployment sizes it to data volume (e.g.
  * ~2000 buckets for a 10 TB fact at 5 GB/bucket) — here 8 buckets keep
  * the toy-scale file count sane.
  *
  * Sorting within buckets (`sortBy` on the join key) additionally lets
  * the sort-merge join skip its sort when each bucket holds one file —
  * with several files per bucket Spark re-sorts but still never
  * exchanges.
  */
object BucketedStore extends QueryPack {

  /** Write `df` as a bucketed, bucket-sorted managed-path table. */
  def write(df: DataFrame, table: String, path: String,
      buckets: Int, key: String): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)
  }

  /** Store files live on the same scratch tier as shuffle data (tmpfs
    * when available): the store is a per-JVM rebuilt cache of driver
    * testdata, and on this shared-VM host the root disk's co-tenant IO
    * otherwise leaks straight into every q28 measurement. */
  private def storeRoot: String = graft.Engine.scratchRoot + "/graft-bucketed-store"

  /** Store builds already paid this JVM, keyed by (dir, buckets). The
    * whole point of the bucketed layout is that the ingest shuffle is
    * paid ONCE and amortized over every later join — so repeated calls
    * (and repeated bench passes) must measure the co-located join, not
    * re-pay the ingest. A fresh JVM starts with an empty catalog and
    * rebuilds on first use (SaveMode.Overwrite handles leftovers on
    * disk). */
  private val built = scala.collection.mutable.Set.empty[String]

  /** Build the bucketed orders/lineitem pair for `dir` (once per JVM) and
    * return the co-located equi-join — the DataFrame the spec plan-checks
    * for zero Exchange. The merge hint pins sort-merge join (at toy scale
    * the planner would otherwise broadcast, which also avoids a shuffle
    * but demonstrates nothing about the layout). */
  def colocatedJoin(s: SparkSession, dir: String, buckets: Int = 8): DataFrame = {
    val key = s"$dir|$buckets"
    synchronized {
      if (!built(key)) {
        write(Tables.orders(s, dir), "graft_bkt_orders",
          s"$storeRoot/orders", buckets, "o_orderkey")
        write(Tables.lineitem(s, dir), "graft_bkt_lineitem",
          s"$storeRoot/lineitem", buckets, "l_orderkey")
        built.clear() // one store per JVM: a new dir invalidates the old
        built += key
      }
    }
    s.table("graft_bkt_orders").hint("merge")
      .join(s.table("graft_bkt_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
  }

  /** The fact⋈fact join + rollup over the bucketed store: revenue and
    * volume per order priority. The only Exchange in the whole plan is
    * the final 5-row groupBy — the join itself runs shuffle-free off the
    * bucketed scans. */
  def q28BucketedJoin(s: SparkSession, dir: String): DataFrame =
    colocatedJoin(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count_distinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_items"),
        Num.moneySum(col("l_extendedprice")).as("sum_price"),
        (sum(Num.cents(col("l_quantity"))) / 100.0).as("sum_qty"))
      .orderBy(col("o_orderpriority"))

  val queries: Map[String, Q] = Map(
    "q28_bucketed_join" -> (q28BucketedJoin _))

  val oracleSql: Map[String, String] = Map(
    "q28_bucketed_join" ->
      s"""SELECT o_orderpriority,
         |  count(DISTINCT o_orderkey) AS n_orders,
         |  count(*) AS n_items,
         |  ${Num.sql.moneySum("l_extendedprice")} AS sum_price,
         |  ${Num.sql.moneySum("l_quantity")} AS sum_qty
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY 1 ORDER BY 1""".stripMargin)
}
