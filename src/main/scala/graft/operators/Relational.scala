package graft.operators

import graft.{Num, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational / BI core — the reference's Impala query surface plus the
  * per-key "entity" aggregation its streaming jobs maintain.
  *
  * Origins (reference file:line):
  *  - q1:  impala/ny_taxi/bi_payment_type_roll_up.impala:1-31 (multi-measure
  *         sum/max/avg rollup by two category keys)
  *  - q2:  impala/ny_taxi/bi_top_ten_venders_in_trips.impala (top-N by count)
  *  - q3:  impala/ny_taxi/bi_pull_up_vender_trip_history.impala (key scan)
  *  - q4/q12: impala/ny_taxi/bi_trip_per_time_of_day.impala (dow × hod)
  *  - q5:  ny_taxi/pojo/NyTaxiYellowEntity.scala:31-60 (conditional sums and
  *         counters gated by payment type; max distance; grand totals)
  *  - q9:  Kudu sink insert-vs-update key split
  *         (ny_taxi/NyTaxiYellowTripStreaming.scala:223-229)
  *  - q18: NyTaxiYellowEntity max_distance_of_trip → arg-max generalization
  *
  * All floating aggregates use [[graft.Num]] exact cent-scaled arithmetic
  * so results are bit-identical to the DuckDB oracle. Every query ends in
  * a deterministic total ORDER BY.
  */
object Relational extends QueryPack {
  import Num.{cents, moneySum, moneyAvg}

  private def centsWhen(cond: Column, c: Column): Column =
    sum(when(cond, cents(c)).otherwise(0L))
  private def cntWhen(cond: Column): Column =
    sum(when(cond, 1L).otherwise(0L))

  def q1RollupMeasures(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (sum(cents(col("l_quantity"))) / 100.0).as("sum_qty"),
        max(col("l_quantity")).as("max_qty"),
        (sum(cents(col("l_quantity"))) / 100.0 / count(lit(1))).as("avg_qty"),
        moneySum(col("l_extendedprice")).as("sum_price"),
        max(col("l_extendedprice")).as("max_price"),
        moneyAvg(col("l_extendedprice")).as("avg_price"),
        moneySum(col("l_discount")).as("sum_disc"),
        moneyAvg(col("l_discount")).as("avg_disc"),
        moneySum(col("l_tax")).as("sum_tax"),
        moneyAvg(col("l_tax")).as("avg_tax"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  def q2TopkByAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("trip_cnt"), moneySum(col("o_totalprice")).as("sum_total"))
      .orderBy(col("trip_cnt").desc, col("o_custkey"))
      .limit(10)

  def q3HistoryLookup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_suppkey") === 7L)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_returnflag"), col("l_shipdate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  def q4TimeOfDay(s: SparkSession, dir: String): DataFrame =
    Tables.eventsTs(s, dir)
      .select(dayofweek(col("tstamp")).as("day_of_week"), hour(col("tstamp")).as("hour_of_day"),
        col("value"))
      .filter(col("day_of_week") === 3)
      .groupBy(col("day_of_week"), col("hour_of_day"))
      .agg(count(lit(1)).as("cnt"), moneyAvg(col("value")).as("avg_value"))
      .orderBy(col("hour_of_day"))

  /** The NyTaxiYellowEntity wide conditional aggregate, per customer over
    * orders; o_orderstatus plays the reference's payment_type. */
  def q5EntityAggregate(s: SparkSession, dir: String): DataFrame = {
    val st = col("o_orderstatus")
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("total_trips"),
        moneySum(col("o_totalprice")).as("total_amount"),
        max(col("o_totalprice")).as("max_amount"),
        (centsWhen(st === "O", col("o_totalprice")) / 100.0).as("open_amount"),
        (centsWhen(st === "F", col("o_totalprice")) / 100.0).as("fulfilled_amount"),
        (centsWhen(st === "P", col("o_totalprice")) / 100.0).as("pending_amount"),
        cntWhen(st === "O").as("open_trips"),
        cntWhen(st === "F").as("fulfilled_trips"),
        cntWhen(st === "P").as("pending_trips"))
      .orderBy(col("o_custkey"))
  }

  def q6FilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R" &&
        col("l_shipdate") >= to_timestamp(lit("1995-06-01")) &&
        col("l_shipdate") < to_timestamp(lit("1995-09-01")))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_shipdate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  def q7JoinEnrich(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("order_cnt"),
        moneySum(col("o_totalprice")).as("revenue"),
        max(col("o_totalprice")).as("max_price"),
        moneyAvg(col("o_totalprice")).as("avg_price"))
      .orderBy(col("c_mktsegment"))
  }

  def q8MultiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    // revenue at 4-decimal exact scale: price*(1-disc) has <= 4 decimals
    val rev = round((col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * 10000).cast("long")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg((sum(rev) / 10000.0).as("revenue"), count(lit(1)).as("line_cnt"))
      .orderBy(col("n_name"))
  }

  def q9aSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("active_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** "New keys" side of the Kudu insert-vs-update split: customers with
    * no fulfilled order yet (the store subset), i.e. rows the sink would
    * INSERT rather than UPDATE. */
  def q9bAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("new_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** Top-5 per segment via the bounded [[TopKByScore]] aggregate (partial-
    * aggregable, O(k) state) instead of a window over a 5-value partition
    * key — the map side reduces to k rows per (task, segment) before the
    * shuffle, so the plan survives 100× data. */
  def q10WindowRank(s: SparkSession, dir: String): DataFrame = {
    val topk = udaf(new TopKByScore(5))
    Tables.customer(s, dir)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
      .groupBy(col("c_mktsegment"))
      .agg(topk(col("c_acctbal"), col("c_custkey")).as("top"))
      .select(col("c_mktsegment"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("c_mktsegment"), col("t.key").as("c_custkey"),
        col("t.score").as("c_acctbal"), (col("pos") + 1).cast("long").as("rn"))
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  def q11WindowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.eventsTs(s, dir)
      .filter(col("user_id") < 5)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("value"))
      .withColumn("running_value", sum(cents(col("value"))).over(w) / 100.0)
      .select(col("user_id"), col("event_id"), col("running_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Trailing-hour moving aggregate per user — the telemetry smoothing
    * query (rolling rate/average over EVENT TIME, not row count), the
    * one window shape q10/q11 do not cover: `rangeBetween` over the
    * event-time axis, where the frame is "everything in the last hour"
    * regardless of how many rows that is. Partitioned by high-cardinality
    * user_id, so the window parallelizes across executors; sums ride the
    * scaled-integer cents path and the average divides once at the end —
    * oracle-exact. Time ties land in the same frame in both engines
    * (RANGE frames include ALL peers of the bound). */
  def q29MovingAvg(s: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-hourUs, 0)
    Tables.eventsTs(s, dir)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        cents(col("value")).as("vc"))
      .withColumn("n_window", count(lit(1)).over(w))
      .withColumn("sum_c", sum(col("vc")).over(w))
      .select(col("event_id"), col("user_id"), col("ts_us"), col("n_window"),
        (col("sum_c") / 100.0).as("sum_value"),
        (col("sum_c").cast("double") / 100.0 / col("n_window")).as("avg_value"))
      .orderBy(col("event_id"))
  }

  /** Ordered conversion funnel (view → click-after-view →
    * purchase-after-click) with per-stage user counts and average
    * stage-to-stage delay — the sequence-match report every product
    * analytics stack runs over an event stream.
    *
    * Shape: stage k's earliest qualifying time needs stage k-1's, so
    * the funnel is a CHAIN of per-user conditional mins — three
    * partial-aggregable groupBys on the same high-cardinality user key
    * (co-partitioned, so AQE plans the stage joins without fresh
    * exchanges), never a per-user time-sorted window pass. A one-pass
    * bounded aggregator cannot do this exactly: merging two partial
    * funnel states needs every candidate click, unbounded — so the
    * chain IS the scale-right shape. Counts and µs-delay sums are
    * integers; one division per stage: oracle-exact. */
  def q78Funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsTs(s, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"))
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t1"))
    val t2 = ev.filter(col("event_type") === "click").join(t1, "user_id")
      .filter(col("ts_us") > col("t1"))
      .groupBy(col("user_id"))
      .agg(min(col("ts_us")).as("t2"), min(col("t1")).as("t1"))
    val t3 = ev.filter(col("event_type") === "purchase").join(t2, "user_id")
      .filter(col("ts_us") > col("t2"))
      .groupBy(col("user_id"))
      .agg(min(col("ts_us")).as("t3"), min(col("t2")).as("t2"))
    val r1 = t1.agg(count(lit(1)).as("n1"))
    val r2 = t2.agg(count(lit(1)).as("n2"), sum(col("t2") - col("t1")).as("d2"))
    val r3 = t3.agg(count(lit(1)).as("n3"), sum(col("t3") - col("t2")).as("d3"))
    r1.crossJoin(r2).crossJoin(r3).selectExpr(
      """stack(3,
        |  '1_view', n1, CAST(NULL AS DOUBLE),
        |  '2_click', n2, CAST(d2 AS DOUBLE) / n2,
        |  '3_purchase', n3, CAST(d3 AS DOUBLE) / n3)
        |AS (stage, n_users, avg_delay_us)""".stripMargin)
      .orderBy(col("stage"))
  }

  /** Hourly resample with gap-fill — the telemetry regularization every
    * dashboard/feature pipeline runs: per user, one row per hour from
    * the user's first to last active hour, zero-filled counts/sums for
    * silent hours and the last observed reading carried forward across
    * them.
    *
    * Shape: bucket aggregate (user, hour) → per-user span → `sequence`
    * + explode materializes the dense hour axis (output-proportional,
    * no driver loop) → left join buckets (user-keyed, co-partitioned)
    * → carry-forward via `last(ignoreNulls)` over a user-partitioned
    * hour-ordered window (high-cardinality partition key, parallel by
    * user). In-hour "last" is max_by over the (ts, event_id) struct —
    * totally ordered, so deterministic in both engines. Integer
    * cents + two final /100.0 divisions: oracle-exact. */
  def q80Resample(s: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    // The bucket relation is consumed twice (span aggregate + join
    // side); unpersisted, the optimizer column-prunes the two consumers
    // into DIFFERENT subtrees and the events scan + bucket aggregate run
    // twice. Persisted and user-repartitioned, the scan/aggregate run
    // once and the ONE user-keyed exchange serves every downstream op:
    // the span aggregate, BOTH join sides (user is a join-key subset, so
    // the co-partitioned join needs no exchange) and the carry-forward
    // window all require clustering by user_id — without it each
    // re-shuffled separately (guide §2.4, share one exchange). The
    // bucket aggregate keeps its own (user, hour) exchange so map-side
    // combine still compresses raw events before any wide transfer.
    val b = graft.FrameCache.persisted(s, s"q80buckets:$dir") {
      Tables.eventsTs(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          cents(col("value")).as("vc"))
        .withColumn("hour", expr(s"ts_us div $hourUs"))
        .groupBy(col("user_id"), col("hour"))
        .agg(count(lit(1)).as("n"), sum(col("vc")).as("sum_c"),
          max_by(col("vc"), struct(col("ts_us"), col("event_id"))).as("last_vc"))
        .repartition(col("user_id"))
    }
    val hours = b.groupBy(col("user_id"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("hour"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hours.join(b, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        (coalesce(col("sum_c"), lit(0L)) / 100.0).as("sum_value"),
        col("last_vc"))
      .withColumn("carried_value",
        last(col("last_vc"), ignoreNulls = true).over(w) / 100.0)
      .drop("last_vc")
      .orderBy(col("user_id"), col("hour"))
  }

  /** SCD2 history build — the warehouse staple the Kudu upsert store
    * deliberately does NOT give you (upsert keeps only current state):
    * collapse each user's event stream into validity intervals, one row
    * per RUN of consecutive equal attribute values, [valid_from,
    * valid_to) half-open with NULL valid_to on the current run.
    *
    * Classic gaps-and-islands: a lag-based change flag, a running sum
    * turning flags into run ids, a per-run aggregate, and lead() for
    * the closing timestamps — all three windows partition on
    * high-cardinality user_id (parallel by user; the run-id prefix sum
    * is per-user, NOT the global q68 trap), and the aggregate between
    * them is partial-aggregable. The event order (ts, event_id) is
    * total, so runs are identical in both engines: oracle-exact. */
  def q81Scd2(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    // run_id in the closing order: two runs CAN share a start timestamp
    // (a type change between same-ts events); run_id is chronological by
    // construction, so it is the deterministic tiebreaker in both engines
    val wRun = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from_us"), col("run_id"))
    val prev = lag(col("event_type"), 1).over(wOrd)
    Tables.eventsTs(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .withColumn("chg",
        when(prev.isNull || prev =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("run_id",
        sum(col("chg")).over(wOrd.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col("user_id"), col("run_id"), col("event_type"))
      .agg(min(col("ts_us")).as("valid_from_us"), count(lit(1)).as("n_events"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(wRun))
      .select(col("user_id"), col("event_type"), col("valid_from_us"),
        col("valid_to_us"), col("n_events"), col("run_id"))
      .orderBy(col("user_id"), col("valid_from_us"), col("run_id"))
      .drop("run_id")
  }

  /** Distribution-drift report — the data-drift gate a training pipeline
    * runs before trusting a new ingest window: the event-type mix of the
    * stream's LATE half vs its EARLY half (split at the midpoint of the
    * observed time range), with each category's share drift in integer
    * parts-per-billion. |share_early − share_late| is the per-category
    * total-variation contribution; summing `drift_ppb` and halving gives
    * the TV distance a monitor alarms on. Shares floor-divide BEFORE
    * differencing (n·10⁹ div N), so every value is exact integer
    * arithmetic in both engines — oracle-exact. n·10⁹ stays far below
    * Long overflow until ~9·10⁹ events per window; beyond that the same
    * plan runs on DECIMAL(38,0).
    *
    * Shape: one scan → one broadcast 1-row min/max → one
    * partial-aggregable groupBy on the (low-cardinality) category with
    * conditional counters — no second shuffle; the totals come from an
    * UNPARTITIONED window over the already-aggregated handful of
    * category rows (the q65 post-aggregation rule — a second lazy
    * aggregate would re-execute the whole counts subtree instead). */
  /** q112: point-in-time enrichment — the feature-store correctness
    * join: every event picks up the SCD2 dimension version (q81's
    * intervals) that was CURRENT at its timestamp, never a later one
    * (no feature leakage) and never an earlier one (no staleness).
    *
    * The engine runs a real AS-OF mechanism, not a theta join: interval
    * starts and events union into one frame ordered per user by the
    * EVENT ordering key (ts, event_id — two runs can share a start
    * timestamp, so a timestamp-only carry-forward cannot place the
    * boundary; the interval row carries its first event's id and sorts
    * immediately BEFORE it), and the dimension attributes carry forward
    * through one user-keyed window — one shuffle, the q26 shape. The
    * ORACLE recomputes each event's run attributes INDEPENDENTLY via
    * window functions (no join at all), so any boundary defect in the
    * as-of placement — off-by-one at a version change, same-timestamp
    * tie broken the wrong way — breaks the hash: ORACLE-EXACT.
    *
    * At scale: dimension rows ≪ fact rows ride the same user-keyed
    * exchange the facts already pay; no driver state, no broadcast of
    * anything fact-sized. */
  def q112PitEnrich(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val prev = lag(col("event_type"), 1).over(wOrd)
    val base = Tables.eventsTs(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .withColumn("chg",
        when(prev.isNull || prev =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("run_id",
        sum(col("chg")).over(wOrd.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    // the SCD2 dimension (q81's intervals), carrying each run's FIRST
    // event id as its position in the per-user event order
    val dims = base.groupBy(col("user_id"), col("run_id"), col("event_type"))
      .agg(min(col("ts_us")).as("d_from"),
        min(struct(col("ts_us"), col("event_id"))).as("first"),
        count(lit(1)).as("d_n"))
      .select(col("user_id"), col("first.ts_us").as("ts_us"),
        col("first.event_id").as("ord_id"), lit(0L).as("kind"),
        col("event_type").as("d_type"), col("d_from"), col("d_n"),
        lit(null).cast("long").as("event_id"),
        lit(null).cast("string").as("event_type"))
    val facts = base
      .select(col("user_id"), col("ts_us"), col("event_id").as("ord_id"),
        lit(1L).as("kind"), lit(null).cast("string").as("d_type"),
        lit(null).cast("long").as("d_from"), lit(null).cast("long").as("d_n"),
        col("event_id"), col("event_type"))
    // per user: (ts, event_id, kind) puts each version row immediately
    // before its first event; carry the version forward from there
    val wAsOf = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("ord_id"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dims.unionAll(facts)
      .withColumn("dim_type", last(col("d_type"), ignoreNulls = true).over(wAsOf))
      .withColumn("dim_from_us", last(col("d_from"), ignoreNulls = true).over(wAsOf))
      .withColumn("dim_run_events", last(col("d_n"), ignoreNulls = true).over(wAsOf))
      .filter(col("kind") === 1L)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("event_type"), col("dim_type"), col("dim_from_us"),
        col("dim_run_events"))
      .orderBy(col("event_id"))
  }

  def q94DriftTv(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsTs(s, dir).select(col("ts_us"), col("event_type"))
    val mm = ev.agg(min(col("ts_us")).as("tmn"), max(col("ts_us")).as("tmx"))
    val counts = ev.crossJoin(broadcast(mm))
      .withColumn("late", col("ts_us") > expr("(tmn + tmx) div 2"))
      .groupBy(col("event_type"))
      .agg(count(when(!col("late"), 1)).as("n_early"),
        count(when(col("late"), 1)).as("n_late"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    counts
      .withColumn("ne", sum(col("n_early")).over(wAll))
      .withColumn("nl", sum(col("n_late")).over(wAll))
      .withColumn("share_early_ppb",
        when(col("ne") === 0, 0L).otherwise(expr("(n_early * 1000000000) div ne")))
      .withColumn("share_late_ppb",
        when(col("nl") === 0, 0L).otherwise(expr("(n_late * 1000000000) div nl")))
      .select(col("event_type"), col("n_early"), col("n_late"),
        col("share_early_ppb"), col("share_late_ppb"),
        abs(col("share_early_ppb") - col("share_late_ppb")).as("drift_ppb"))
      .orderBy(col("event_type"))
  }

  def q12DowHodSpeed(s: SparkSession, dir: String): DataFrame =
    Tables.eventsTs(s, dir)
      .select(dayofweek(col("tstamp")).as("day_of_week"), hour(col("tstamp")).as("hour_of_day"),
        col("value"))
      .groupBy(col("day_of_week"), col("hour_of_day"))
      .agg(count(lit(1)).as("cnt"),
        moneyAvg(col("value")).as("avg_value"),
        moneySum(col("value")).as("sum_value"))
      .orderBy(col("day_of_week"), col("hour_of_day"))

  def q13DistinctCount(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"))

  /** rows-only: approx distinct (HLL) — cardinality sketch for 100 TB scale. */
  def q13bApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"))

  def q14UnionAll(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val buys = e.filter(col("event_type") === "purchase").select(lit("buy").as("tag"), col("value"))
    val errs = e.filter(col("event_type") === "error").select(lit("err").as("tag"), col("value"))
    buys.unionAll(errs)
      .groupBy(col("tag"))
      .agg(count(lit(1)).as("cnt"), moneySum(col("value")).as("sum_value"))
      .orderBy(col("tag"))
  }

  def q15CubeRollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg((sum(cents(col("l_quantity"))) / 100.0).as("sum_qty"), count(lit(1)).as("cnt"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("cnt"))
      .orderBy(col("rf"), col("ls"))

  /** Discrete percentiles via explicit rank formula (identical both engines,
    * avoiding engine-specific interpolation).
    *
    * Scale shape: instead of sorting every row through a 3-task window
    * (full shuffle of lineitem into 3 partitions), first hash-aggregate to
    * per-(flag, price) counts — partial-aggregable, output bounded by the
    * price domain, not the row count — then run the cumulative window over
    * the distinct values only. The value at rank ceil(n*q) is the smallest
    * price whose cumulative count reaches the rank. */
  def q16Percentiles(s: SparkSession, dir: String): DataFrame = {
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("l_returnflag"))
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_extendedprice"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("cnt", sum(col("c")).over(wAll))
      .groupBy(col("l_returnflag"))
      .agg(
        min(when(col("cum") >= ceil(col("cnt") * 0.5), col("l_extendedprice"))).as("median_price"),
        min(when(col("cum") >= ceil(col("cnt") * 0.95), col("l_extendedprice"))).as("p95_price"))
      .orderBy(col("l_returnflag"))
  }

  /** rows-only: the 100 TB percentile path — approx_percentile is a
    * partial-aggregable sketch (one pass, no sort, no wide shuffle);
    * exact q16 stays as the oracle tier. */
  def q16bApproxQuantiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("median_approx"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("p95_approx"))
      .orderBy(col("l_returnflag"))

  /** Skew-safe aggregation: a groupBy on a handful of hot keys (event
    * types here) funnels every row of a hot key through one reducer at
    * 100 TB. Salting splits each hot key into 32 deterministic sub-keys
    * (partial aggregate), then the tiny salted result re-aggregates on
    * the real key — the classic two-phase skew pattern, on top of the
    * map-side combine Spark already does. Result is identical to the
    * direct groupBy (the oracle states it directly). */
  def q24SaltedAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("salt", pmod(col("event_id"), lit(32)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("c"), sum(cents(col("value"))).as("vc"))
      .groupBy(col("event_type"))
      .agg(sum(col("c")).as("cnt"), (sum(col("vc")) / 100.0).as("sum_value"))
      .orderBy(col("event_type"))

  /** Skew-mitigated equi-JOIN — q24's salting applied to the other
    * skew victim (q111 diagnoses both): when one join key owns a huge
    * share of the fact rows, an equi-partitioned shuffle join hands
    * that key's whole load to one task. Salting splits it: the fact
    * side derives a deterministic salt in [0, salts) from a row-unique
    * column (no rand() — replays must reproduce), the dimension side
    * replicates each row once per salt value, and the join runs on
    * (key, salt) — the hot key's rows spread across `salts` tasks, at
    * the cost of a salts× dimension replication (entity-sized, the
    * acceptable side). Results are identical to the direct join by
    * construction (spec-asserted on a planted hot key, alongside the
    * AQE skew-split path that handles the same regime without a code
    * change when sizes cross its thresholds). */
  def saltedJoin(fact: DataFrame, saltSrc: org.apache.spark.sql.Column,
      dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1)
    // NULL saltSrc must not drop the row (a NULL salt never equi-joins):
    // park it in bucket 0 — identity with the direct join holds for
    // every row, not just rows with a non-null salt source
    val f = fact.withColumn("__graft_salt",
      coalesce(pmod(saltSrc.cast("long"), lit(salts.toLong)), lit(0L)))
    val d = dim.withColumn("__graft_salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    f.join(d, Seq(key, "__graft_salt")).drop("__graft_salt")
  }

  def q17ConditionalCounters(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        cntWhen(col("l_quantity") > 25.0).as("big_qty_cnt"),
        cntWhen(col("l_discount") === 0.0).as("no_disc_cnt"),
        cntWhen(col("l_tax") > 0.05).as("high_tax_cnt"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"))

  /** Arg-max (max_distance_of_trip "which trip was it" generalization,
    * NyTaxiYellowEntity.scala) as a partial-aggregable `max_by` with a
    * struct ordering key — one hash-aggregate pass with map-side combine,
    * no per-key global sort. Tie-break: highest price, then lowest
    * orderkey (negated key inside the max ordering). */
  def q18MinmaxBy(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderpriority"), col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .groupBy(col("o_orderpriority"))
      .agg(max_by(
        struct(col("o_custkey"), col("o_totalprice")),
        struct(col("o_totalprice"), (-col("o_orderkey")).as("nk"))).as("top"))
      .select(col("o_orderpriority"), col("top.o_custkey").as("top_custkey"),
        col("top.o_totalprice").as("top_price"))
      .orderBy(col("o_orderpriority"))

  /** As-of join — the operator Spark lacks natively: every purchase
    * event attributed to the same user's most recent click at or before
    * it (click-to-purchase attribution). Built the SCALABLE way: union
    * the two tagged event streams, one shuffle keyed by user, and a
    * per-user ordered window carries the last-seen click forward
    * (`last(..., ignoreNulls)` over unbounded-preceding..current) — the
    * sort is per-user (high-cardinality key) and the whole join is one
    * exchange, where the naive formulation (theta-join on
    * `ts_click <= ts_purchase` + argmax) plans as an O(n*m)
    * BroadcastNestedLoop. At equal timestamps the click sorts first
    * (kind 0 < 1), giving at-or-before semantics — exactly DuckDB's
    * native `ASOF LEFT JOIN`, which the oracle states directly. */
  def q26AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsTs(s, dir)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("event_type"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), lit(0).as("kind"),
        lit(null).cast("long").as("event_id"),
        col("event_id").as("click_id"), col("value").as("click_value"),
        col("ts_us").as("click_ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), lit(1).as("kind"),
        col("event_id"),
        lit(null).cast("long").as("click_id"),
        lit(null).cast("double").as("click_value"),
        lit(null).cast("long").as("click_ts_us"))
    // click_id as the final sort key makes click-click timestamp ties
    // deterministic (attribute the highest click id); purchases carry a
    // null click_id, which sorts first and cannot reorder across kinds.
    // The driver corpus has no (user, ts) ties, so the oracle's ASOF
    // (which cannot express a tie-break) still matches exactly.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("kind"), col("click_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("a_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("a_click_value", last(col("click_value"), ignoreNulls = true).over(w))
      .withColumn("a_click_ts", last(col("click_ts_us"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"),
        col("a_click_id").as("click_id"),
        col("a_click_value").as("click_value"),
        (col("ts_us") - col("a_click_ts")).as("lag_us"))
      .orderBy(col("event_id"))
  }

  /** Range (interval) join — every error event opens a 1-hour incident
    * window; aggregate ALL events falling inside each window. Spark
    * plans a raw `ts >= start AND ts < end` theta join as a nested loop,
    * so this builds the scale shape instead: bucket time at the window
    * length, join on the bucket key (an interval of length L overlaps at
    * most 2 L-sized buckets, so the incident side lists its <= 2 buckets
    * and the probe side its single bucket — candidates via ONE
    * equi-shuffle), then apply the exact range predicate and aggregate.
    * Candidate volume is pairs-per-bucket, not |events| x |incidents|.
    * The oracle states the plain inequality join (DuckDB's IEJoin
    * handles it at oracle scale). */
  def q27RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val winUs = 3600L * 1000000 // 1h incident window = bucket length
    val ev = Tables.eventsTs(s, dir)
      .select(col("event_id"), col("ts_us"), col("value"), col("event_type"))
    val incidents = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"), col("ts_us").as("start_us"))
      .select(col("incident_id"), col("start_us"),
        explode(array_distinct(array(
          floor(col("start_us") / winUs).cast("long"),
          floor((col("start_us") + winUs - 1) / winUs).cast("long")))).as("bucket"))
    val probes = ev
      .select(col("event_id"), col("ts_us"), col("value"),
        floor(col("ts_us") / winUs).cast("long").as("bucket"))
    probes.join(incidents, "bucket")
      .filter(col("ts_us") >= col("start_us") &&
        col("ts_us") < col("start_us") + winUs)
      .groupBy(col("incident_id"))
      .agg(count(lit(1)).as("n_events"), Num.moneySum(col("value")).as("sum_value"))
      .orderBy(col("incident_id"))
  }

  // ---- oracle SQL ----

  private val S = Num.sql

  val queries: Map[String, Q] = Map(
    "q1_rollup_measures" -> (q1RollupMeasures _),
    "q2_topk_by_agg" -> (q2TopkByAgg _),
    "q3_history_lookup" -> (q3HistoryLookup _),
    "q4_time_of_day" -> (q4TimeOfDay _),
    "q5_entity_aggregate" -> (q5EntityAggregate _),
    "q6_filter_project" -> (q6FilterProject _),
    "q7_join_enrich" -> (q7JoinEnrich _),
    "q8_multi_join" -> (q8MultiJoin _),
    "q9a_semi_join" -> (q9aSemiJoin _),
    "q9b_anti_join" -> (q9bAntiJoin _),
    "q10_window_rank" -> (q10WindowRank _),
    "q11_window_running" -> (q11WindowRunning _),
    "q12_dow_hod_speed" -> (q12DowHodSpeed _),
    "q13_distinct_count" -> (q13DistinctCount _),
    "q13b_approx_distinct" -> (q13bApproxDistinct _),
    "q14_union_all" -> (q14UnionAll _),
    "q15_cube_rollup" -> (q15CubeRollup _),
    "q16_percentiles" -> (q16Percentiles _),
    "q16b_approx_quantiles" -> (q16bApproxQuantiles _),
    "q24_salted_agg" -> (q24SaltedAgg _),
    "q17_conditional_counters" -> (q17ConditionalCounters _),
    "q18_minmax_by" -> (q18MinmaxBy _),
    "q26_asof_join" -> (q26AsofJoin _),
    "q27_range_join" -> (q27RangeJoin _),
    "q29_moving_avg" -> (q29MovingAvg _),
    "q78_funnel" -> (q78Funnel _),
    "q80_resample" -> (q80Resample _),
    "q81_scd2" -> (q81Scd2 _),
    "q94_drift_tv" -> (q94DriftTv _),
    "q112_pit_enrich" -> (q112PitEnrich _))

  val oracleSql: Map[String, String] = Map(
    "q94_drift_tv" ->
      """WITH e AS (SELECT epoch_us(ts) AS tus, event_type FROM events),
        |mm AS (SELECT min(tus) AS tmn, max(tus) AS tmx FROM e),
        |c AS (
        |  SELECT event_type,
        |    CAST(count(CASE WHEN tus <= (tmn + tmx) // 2 THEN 1 END) AS BIGINT) AS n_early,
        |    CAST(count(CASE WHEN tus > (tmn + tmx) // 2 THEN 1 END) AS BIGINT) AS n_late
        |  FROM e CROSS JOIN mm GROUP BY event_type),
        |t AS (SELECT CAST(sum(n_early) AS BIGINT) AS ne,
        |             CAST(sum(n_late) AS BIGINT) AS nl FROM c),
        |sh AS (
        |  SELECT event_type, n_early, n_late,
        |    CAST(CASE WHEN ne = 0 THEN 0
        |      ELSE (n_early * 1000000000) // ne END AS BIGINT) AS share_early_ppb,
        |    CAST(CASE WHEN nl = 0 THEN 0
        |      ELSE (n_late * 1000000000) // nl END AS BIGINT) AS share_late_ppb
        |  FROM c CROSS JOIN t)
        |SELECT event_type, n_early, n_late, share_early_ppb, share_late_ppb,
        |  abs(share_early_ppb - share_late_ppb) AS drift_ppb
        |FROM sh ORDER BY event_type""".stripMargin,
    // q112's twin derives each event's run attributes INDEPENDENTLY
    // (window recomputation, no join), so the engine's as-of mechanism
    // is gated against a derivation that shares none of its moving parts
    "q112_pit_enrich" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events),
        |c AS (
        |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |r AS (
        |  SELECT *, sum(chg) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS run_id
        |  FROM c)
        |SELECT event_id, user_id, ts_us, event_type,
        |  event_type AS dim_type,
        |  min(ts_us) OVER (PARTITION BY user_id, run_id) AS dim_from_us,
        |  count(*) OVER (PARTITION BY user_id, run_id) AS dim_run_events
        |FROM r ORDER BY event_id""".stripMargin,
    "q81_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events),
        |c AS (
        |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |r AS (
        |  SELECT *, sum(chg) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS run_id
        |  FROM c),
        |g AS (
        |  SELECT user_id, run_id, event_type, min(ts_us) AS valid_from_us,
        |    count(*) AS n_events
        |  FROM r GROUP BY 1, 2, 3)
        |SELECT user_id, event_type, valid_from_us,
        |  lead(valid_from_us) OVER (PARTITION BY user_id
        |    ORDER BY valid_from_us, run_id) AS valid_to_us,
        |  CAST(n_events AS BIGINT) AS n_events
        |FROM g ORDER BY user_id, valid_from_us, run_id""".stripMargin,
    "q80_resample" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events),
        |b AS (
        |  SELECT user_id, ts_us // 3600000000 AS hour, count(*) AS n,
        |    CAST(sum(vc) AS BIGINT) AS sum_c,
        |    last(vc ORDER BY ts_us, event_id) AS last_vc
        |  FROM e GROUP BY 1, 2),
        |spans AS (SELECT user_id, min(hour) AS h0, max(hour) AS h1
        |  FROM b GROUP BY 1),
        |hours AS (SELECT user_id, unnest(generate_series(h0, h1)) AS hour
        |  FROM spans),
        |j AS (
        |  SELECT hours.user_id, hours.hour,
        |    coalesce(b.n, 0) AS n_events,
        |    coalesce(b.sum_c, 0) AS sum_c, b.last_vc
        |  FROM hours LEFT JOIN b
        |    ON hours.user_id = b.user_id AND hours.hour = b.hour)
        |SELECT user_id, hour, CAST(n_events AS BIGINT) AS n_events,
        |  sum_c / 100.0 AS sum_value,
        |  (last_value(last_vc IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY hour ROWS UNBOUNDED PRECEDING)) / 100.0 AS carried_value
        |FROM j ORDER BY user_id, hour""".stripMargin,
    "q78_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |t1 AS (SELECT user_id, min(ts_us) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, min(e.ts_us) AS t2, min(t1.t1) AS t1
        |  FROM e JOIN t1 ON e.user_id = t1.user_id
        |  WHERE e.event_type = 'click' AND e.ts_us > t1.t1 GROUP BY 1),
        |t3 AS (SELECT e.user_id, min(e.ts_us) AS t3, min(t2.t2) AS t2
        |  FROM e JOIN t2 ON e.user_id = t2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts_us > t2.t2 GROUP BY 1),
        |r1 AS (SELECT count(*) AS n1 FROM t1),
        |r2 AS (SELECT count(*) AS n2, CAST(sum(t2 - t1) AS BIGINT) AS d2 FROM t2),
        |r3 AS (SELECT count(*) AS n3, CAST(sum(t3 - t2) AS BIGINT) AS d3 FROM t3)
        |SELECT * FROM (
        |  SELECT '1_view' AS stage, n1 AS n_users,
        |    CAST(NULL AS DOUBLE) AS avg_delay_us FROM r1
        |  UNION ALL
        |  SELECT '2_click', n2, CAST(d2 AS DOUBLE) / n2 FROM r2
        |  UNION ALL
        |  SELECT '3_purchase', n3, CAST(d3 AS DOUBLE) / n3 FROM r3)
        |ORDER BY stage""".stripMargin,
    "q29_moving_avg" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |    CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events)
        |SELECT event_id, user_id, ts_us,
        |  count(*) OVER w AS n_window,
        |  CAST(sum(vc) OVER w AS BIGINT) / 100.0 AS sum_value,
        |  CAST(CAST(sum(vc) OVER w AS BIGINT) AS DOUBLE) / 100.0
        |    / (count(*) OVER w) AS avg_value
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q26_asof_join" ->
      """WITH c AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id AS click_id,
        |    value AS click_value
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, c.click_id, c.click_value,
        |  p.ts_us - c.ts_us AS lag_us
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
        |ORDER BY p.event_id""".stripMargin,
    "q27_range_join" ->
      s"""WITH ev AS (
         |  SELECT event_id, epoch_us(ts) AS ts_us, value FROM events),
         |inc AS (
         |  SELECT event_id AS incident_id, epoch_us(ts) AS start_us
         |  FROM events WHERE event_type = 'error')
         |SELECT incident_id, count(*) AS n_events,
         |  ${S.moneySum("ev.value")} AS sum_value
         |FROM inc JOIN ev
         |  ON ev.ts_us >= inc.start_us AND ev.ts_us < inc.start_us + 3600000000
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q1_rollup_measures" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${S.moneySum("l_quantity")} AS sum_qty,
         |  max(l_quantity) AS max_qty,
         |  ${S.moneyAvg("l_quantity")} AS avg_qty,
         |  ${S.moneySum("l_extendedprice")} AS sum_price,
         |  max(l_extendedprice) AS max_price,
         |  ${S.moneyAvg("l_extendedprice")} AS avg_price,
         |  ${S.moneySum("l_discount")} AS sum_disc,
         |  ${S.moneyAvg("l_discount")} AS avg_disc,
         |  ${S.moneySum("l_tax")} AS sum_tax,
         |  ${S.moneyAvg("l_tax")} AS avg_tax,
         |  count(*) AS cnt
         |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q2_topk_by_agg" ->
      s"""SELECT o_custkey, count(*) AS trip_cnt, ${S.moneySum("o_totalprice")} AS sum_total
         |FROM orders GROUP BY 1 ORDER BY trip_cnt DESC, o_custkey LIMIT 10""".stripMargin,
    "q3_history_lookup" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice,
        |  l_returnflag, l_shipdate
        |FROM lineitem WHERE l_suppkey = 7 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q4_time_of_day" ->
      s"""SELECT CAST(dayofweek(ts)+1 AS INTEGER) AS day_of_week,
         |  CAST(hour(ts) AS INTEGER) AS hour_of_day,
         |  count(*) AS cnt, ${S.moneyAvg("value")} AS avg_value
         |FROM events WHERE dayofweek(ts)+1 = 3 GROUP BY 1, 2 ORDER BY hour_of_day""".stripMargin,
    "q5_entity_aggregate" ->
      s"""SELECT o_custkey, count(*) AS total_trips,
         |  ${S.moneySum("o_totalprice")} AS total_amount,
         |  max(o_totalprice) AS max_amount,
         |  sum(CASE WHEN o_orderstatus='O' THEN ${S.cents("o_totalprice")} ELSE 0 END)/100.0 AS open_amount,
         |  sum(CASE WHEN o_orderstatus='F' THEN ${S.cents("o_totalprice")} ELSE 0 END)/100.0 AS fulfilled_amount,
         |  sum(CASE WHEN o_orderstatus='P' THEN ${S.cents("o_totalprice")} ELSE 0 END)/100.0 AS pending_amount,
         |  CAST(sum(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS open_trips,
         |  CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS fulfilled_trips,
         |  CAST(sum(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS pending_trips
         |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q6_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '1995-06-01'
        |  AND l_shipdate < TIMESTAMP '1995-09-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q7_join_enrich" ->
      s"""SELECT c_mktsegment, count(*) AS order_cnt,
         |  ${S.moneySum("o_totalprice")} AS revenue,
         |  max(o_totalprice) AS max_price,
         |  ${S.moneyAvg("o_totalprice")} AS avg_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q8_multi_join" ->
      """SELECT n_name,
        |  sum(CAST(round((l_extendedprice*(1.0-l_discount))*10000) AS BIGINT))/10000.0 AS revenue,
        |  count(*) AS line_cnt
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9a_semi_join" ->
      """SELECT c_mktsegment, count(*) AS active_customers FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9b_anti_join" ->
      """SELECT c_mktsegment, count(*) AS new_customers FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q10_window_rank" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
        |  FROM customer) t
        |WHERE rn <= 5 ORDER BY c_mktsegment, rn""".stripMargin,
    "q11_window_running" ->
      s"""SELECT user_id, event_id,
         |  CAST(sum(${S.cents("value")}) OVER (PARTITION BY user_id
         |    ORDER BY epoch_us(ts), event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)/100.0 AS running_value
         |FROM events WHERE user_id < 5 ORDER BY user_id, event_id""".stripMargin,
    "q12_dow_hod_speed" ->
      s"""SELECT CAST(dayofweek(ts)+1 AS INTEGER) AS day_of_week,
         |  CAST(hour(ts) AS INTEGER) AS hour_of_day,
         |  count(*) AS cnt, ${S.moneyAvg("value")} AS avg_value,
         |  ${S.moneySum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q13_distinct_count" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(DISTINCT l_orderkey) AS n_orders, count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q14_union_all" ->
      s"""SELECT tag, count(*) AS cnt, ${S.moneySum("value")} AS sum_value FROM (
         |  SELECT 'buy' AS tag, value FROM events WHERE event_type = 'purchase'
         |  UNION ALL
         |  SELECT 'err' AS tag, value FROM events WHERE event_type = 'error') t
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q15_cube_rollup" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
         |  ${S.moneySum("l_quantity")} AS sum_qty, count(*) AS cnt
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY 1, 2""".stripMargin,
    "q16_percentiles" ->
      """SELECT l_returnflag,
        |  max(CASE WHEN rn = CAST(ceil(cnt*0.5) AS BIGINT) THEN l_extendedprice END) AS median_price,
        |  max(CASE WHEN rn = CAST(ceil(cnt*0.95) AS BIGINT) THEN l_extendedprice END) AS p95_price
        |FROM (
        |  SELECT l_returnflag, l_extendedprice,
        |    CAST(row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS BIGINT) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS cnt
        |  FROM lineitem) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q24_salted_agg" ->
      s"""SELECT event_type, count(*) AS cnt, ${S.moneySum("value")} AS sum_value
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q17_conditional_counters" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_quantity > 25.0 THEN 1 ELSE 0 END) AS BIGINT) AS big_qty_cnt,
        |  CAST(sum(CASE WHEN l_discount = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS no_disc_cnt,
        |  CAST(sum(CASE WHEN l_tax > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS high_tax_cnt,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q18_minmax_by" ->
      """SELECT o_orderpriority, o_custkey AS top_custkey, o_totalprice AS top_price FROM (
        |  SELECT o_orderpriority, o_custkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn = 1 ORDER BY o_orderpriority""".stripMargin)
}
