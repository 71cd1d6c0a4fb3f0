package graft.sources

import graft.{Engine, Num, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Z-ordered (Morton-curve) parquet layout — the multi-dimensional
  * pruning tier of the store family: [[PartitionedStore]] prunes
  * directories on coarse partition columns, [[BucketedStore]] co-locates
  * key joins, and this layout makes ROW-GROUP statistics selective on
  * TWO query dimensions at once.
  *
  * Why: parquet keeps min/max stats per row group and the scan skips
  * groups whose stats miss the pushed predicate — but stats only prune
  * on columns the physical sort made locally narrow. Sorting events by
  * time alone leaves user_id spanning its full range in every row
  * group, so the canonical ops query "this user cohort in this time
  * window" prunes on time only. Interleaving the bits of the two
  * normalized keys (the Morton curve) bounds BOTH ranges per curve
  * segment, so both predicates skip groups — at 100 TB the difference
  * between reading a time slice of the fleet and reading a cohort slice
  * of a time slice. The curve is space-filling, so the layout stays one
  * total order: writing it is just sort-by-computed-column
  * (`repartitionByRange(zkey) + sortWithinPartitions(zkey)`), no custom
  * writer. ZOrderStoreSpec proves the pruning: the same box predicate
  * over the same rows reads strictly fewer rows from the z-layout than
  * from the time-sorted layout.
  *
  * The z-key is layout-only — it never reaches query results — so the
  * normalization may use data-dependent min/max without touching
  * oracle-exactness.
  */
object ZOrderStore extends QueryPack {

  /** Morton interleave of two 16-bit grid coordinates: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. A 32-term
    * shift/mask/or tree — pure codegen'd long arithmetic. Also exposed
    * to SQL as `graft_zorder(a, b)` via [[graft.GraftExtensions]]. */
  private[graft] def interleave16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** events projected to the store schema with the z-key attached:
    * user_id × ts_us, each affine-normalized to the 16-bit grid over
    * its [min, max] (integer arithmetic; spans up to ~2^46 µs stay far
    * below Long overflow when scaled by 65535). */
  private def withZkey(ev: DataFrame): DataFrame = {
    val mm = ev.agg(min("user_id").as("umn"), max("user_id").as("umx"),
      min("ts_us").as("tmn"), max("ts_us").as("tmx"))
    // Map each span onto the 16-bit grid without unsafe arithmetic: a
    // small span multiplies UP (both factors < 2^16, cannot overflow —
    // and without the spread a 150-value user range would occupy only
    // the low bits, degenerating the curve to a time sort), a large
    // span divides DOWN by ceil(span/65536) (a (x-mn)*65535
    // formulation would wrap Long once the event-time span passes
    // ~2^47 µs ≈ 4.5 years and scramble the layout).
    def grid16(x: String, mn: String, mx: String): String =
      s"CASE WHEN $mx - $mn < 65536 THEN ($x - $mn) * (65536 div ($mx - $mn + 1)) " +
        s"ELSE ($x - $mn) div (($mx - $mn + 65536) div 65536) END"
    ev.crossJoin(broadcast(mm))
      .withColumn("zkey", interleave16(
        expr(grid16("user_id", "umn", "umx")),
        expr(grid16("ts_us", "tmn", "tmx"))))
      .drop("umn", "umx", "tmn", "tmx")
  }

  /** Write `ev` (event_id, user_id, ts_us, value) z-ordered into
    * `files` range partitions — one sorted parquet file per z-range, so
    * each row group's user/ts stats are tight. */
  def writeZOrdered(ev: DataFrame, path: String, files: Int): Unit =
    withZkey(ev)
      .repartitionByRange(files, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Time-sorted twin of [[writeZOrdered]] — the single-dimension
    * layout the spec compares against. */
  def writeTimeSorted(ev: DataFrame, path: String, files: Int): Unit =
    ev.repartitionByRange(files, col("ts_us"))
      .sortWithinPartitions("ts_us")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Per-JVM store cache: dir → (store path, (umn, umx, tmn, tmx)).
    * Bounds are data properties computed during the build scan, kept so
    * queries can plan LITERAL box predicates — only literals reach the
    * parquet reader as pushable filters; join-delivered bounds would
    * not prune anything. Same amortization contract as
    * [[BucketedStore]]: the layout shuffle is paid once per JVM. */
  private val built =
    scala.collection.mutable.Map.empty[String, (String, (Long, Long, Long, Long))]

  def store(s: SparkSession, dir: String): (String, (Long, Long, Long, Long)) =
    synchronized {
      built.getOrElseUpdate(dir, {
        val ev = Tables.eventsTs(s, dir)
          .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
        val r = ev.agg(min("user_id"), max("user_id"),
          min("ts_us"), max("ts_us")).head()
        val path = Engine.storePath("graft-zorder-store", dir)
        writeZOrdered(ev, path, files = 64)
        (path, (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      })
    }

  /** The ops box query over the z-store: one user-cohort decile × one
    * time decile (bounds derived from the corpus min/max by integer
    * arithmetic, so the oracle reproduces them exactly). The plan is a
    * single literal-predicate scan + scalar aggregate; the z layout
    * turns both predicate columns into row-group skips. Value sums ride
    * the scaled-integer money path: oracle-exact. */
  def q76ZorderScan(s: SparkSession, dir: String): DataFrame = {
    val (path, (umn, umx, tmn, tmx)) = store(s, dir)
    val (ulo, uhi) = (umn + (umx - umn + 1) * 2 / 10, umn + (umx - umn + 1) * 3 / 10)
    val (tlo, thi) = (tmn + (tmx - tmn + 1) * 4 / 10, tmn + (tmx - tmn + 1) * 5 / 10)
    s.read.parquet(path)
      .filter(col("user_id") >= ulo && col("user_id") < uhi &&
        col("ts_us") >= tlo && col("ts_us") < thi)
      .agg(count(lit(1)).as("n_events"),
        Num.moneySum(col("value")).as("sum_value"),
        min("event_id").as("min_event"), max("event_id").as("max_event"))
  }

  val queries: Map[String, Q] = Map(
    "q76_zorder_scan" -> (q76ZorderScan _))

  val oracleSql: Map[String, String] = Map(
    "q76_zorder_scan" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events),
         |mm AS (
         |  SELECT min(user_id) AS umn, max(user_id) AS umx,
         |    min(ts_us) AS tmn, max(ts_us) AS tmx FROM e),
         |b AS (
         |  SELECT umn + ((umx - umn + 1) * 2) // 10 AS ulo,
         |    umn + ((umx - umn + 1) * 3) // 10 AS uhi,
         |    tmn + ((tmx - tmn + 1) * 4) // 10 AS tlo,
         |    tmn + ((tmx - tmn + 1) * 5) // 10 AS thi FROM mm)
         |SELECT count(*) AS n_events,
         |  ${Num.sql.moneySum("value")} AS sum_value,
         |  min(event_id) AS min_event, max(event_id) AS max_event
         |FROM e, b
         |WHERE user_id >= ulo AND user_id < uhi
         |  AND ts_us >= tlo AND ts_us < thi""".stripMargin)
}
