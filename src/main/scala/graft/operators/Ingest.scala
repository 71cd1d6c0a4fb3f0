package graft.operators

import graft.{Num, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingest-side operators: tolerant CSV parsing, gap sessionization, and
  * the search-document projection.
  *
  * Origins (reference file:line):
  *  - q19: common/CsvKafkaPublisher.scala:64-71 — header-prefix skip and
  *    short-line skip before publishing; ny_taxi/pojo/NyTaxiYellowTrip.scala
  *    builders — empty CSV field → default value.
  *  - q20: fed_highway_admin trip reconstruction (TripSummaryStreaming.scala)
  *    — contiguous readings folded into per-vehicle trips; here expressed as
  *    gap-based sessionization over `events` per user.
  *  - q23: ny_taxi/NyTaxiYellowTripStreaming.scala:185-212
  *    convertToSolRDocuments — id synthesis `vender_id + "," + pickup_ts`
  *    and ISO-8601 "yyyy-MM-dd'T'HH:mm:ss'Z'" timestamp rendering.
  */
object Ingest extends QueryPack {
  import Num.moneySum

  // The q19 parse contract, shared by the gated query and the observed
  // variant so the two can never drift: drop rule (header prefix or
  // short line) and typed projection (empty status -> "0").
  private def dropRule(headerPrefix: String) =
    col("line").startsWith(headerPrefix) || length(col("line")) < 10
  private def typedOrder = Seq(
    element_at(col("f"), 1).cast("long").as("orderkey"),
    when(element_at(col("f"), 3) === "", "0")
      .otherwise(element_at(col("f"), 3)).as("status"),
    element_at(col("f"), 4).cast("double").as("totalprice"))

  /** Tolerant CSV ingest. The CSV byte stream is derived deterministically
    * from the orders table (the driver testdata has no raw CSV): every
    * 50th order renders as a malformed short line, every 37th with an
    * empty status field. The parser then applies the reference's rules —
    * skip the header line, skip lines shorter than 10 chars, default
    * empty fields to "0" — and aggregates what survived.
    *
    * Scale shape: line synthesis, parsing, and the aggregate are all
    * narrow row-local ops fused into one codegen stage over the scan; the
    * only shuffle is the final 1-key-group aggregate exchange. */
  def q19CsvIngest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lines = Tables.orders(s, dir).select(
      when(col("o_orderkey") % 50 === 0, lit("BAD"))
        .otherwise(concat_ws(",",
          col("o_orderkey"), col("o_custkey"),
          when(col("o_orderkey") % 37 === 0, lit(""))
            .otherwise(col("o_orderstatus")),
          col("o_totalprice").cast("string"),
          col("o_orderpriority"))).as("line"))
    val header = Seq("o_orderkey,o_custkey,o_orderstatus,o_totalprice,o_orderpriority")
      .toDF("line")
    header.unionAll(lines)
      .filter(!dropRule("o_orderkey"))
      .withColumn("f", split(col("line"), ","))
      .select(typedOrder: _*)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("cnt"), moneySum(col("totalprice")).as("sum_total"))
      .orderBy(col("status"))
  }

  /** Ingest-quality observability: the q19 parse rules instrumented
    * with the `observe()` API — rows in/kept/dropped and
    * defaulted-field counts accumulate accumulator-style on the SAME
    * single pass (no second scan, no extra job) and are read from the
    * [[org.apache.spark.sql.Observation]] handle after any action; a
    * streaming deployment uses the named-observe variant and reads
    * `StreamingQueryProgress.observedMetrics` per micro-batch. This is
    * the reference's "{Sent:N}" publisher counter done properly: exact,
    * distributed, and free.
    *
    * Returns the parsed typed frame plus the observation handle. */
  def observedCsvParse(lines: DataFrame, headerPrefix: String)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = new org.apache.spark.sql.Observation("ingest_quality")
    val parsed = lines
      .withColumn("drop", dropRule(headerPrefix))
      .withColumn("f", split(col("line"), ","))
      .withColumn("defaulted",
        !col("drop") && element_at(col("f"), 3) === "")
      .observe(obs,
        count(lit(1)).as("rows_in"),
        count(when(!col("drop"), 1)).as("rows_kept"),
        count(when(col("drop"), 1)).as("rows_dropped"),
        count(when(col("defaulted"), 1)).as("fields_defaulted"))
      .filter(!col("drop"))
      .select(typedOrder: _*)
    (parsed, obs)
  }

  /** Gap-based sessionization: a new session starts when a user is idle
    * longer than 12h. Window partitions on `user_id` (high-cardinality) so
    * the sort is per-user and the plan scales with executors, unlike a
    * low-cardinality partition key. */
  def q20Sessionize(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 12L * 3600 * 1000000
    val wSeq = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val wRun = wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.eventsTs(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("value"))
      .withColumn("new_sess",
        when(col("ts_us") - lag(col("ts_us"), 1).over(wSeq) > gapUs, 1L)
          .when(lag(col("ts_us"), 1).over(wSeq).isNull, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        moneySum(col("value")).as("sum_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Row → search document: synthesized id `user_id,iso_ts` and ISO-8601
    * second-resolution timestamps, exactly the Solr document shape. Pure
    * projection — stays in one codegen stage over the scan with the
    * event_type filter pushed to parquet. */
  def q23SearchDocs(s: SparkSession, dir: String): DataFrame = {
    val iso = date_format(col("tstamp"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    Tables.eventsTs(s, dir)
      .filter(col("event_type") === "purchase")
      .select(
        concat(col("user_id").cast("string"), lit(","), iso).as("id"),
        col("event_id"), col("user_id"),
        iso.as("event_time"), col("value"))
      .orderBy(col("event_id"))
  }

  /** Semi-structured payload parsing + derived kinematics: extract the
    * JSON `k` field from event props with a schema'd from_json (pushdown-
    * friendly, no UDF), then derive the reference's acceleration
    * magnitude formula exactly as written —
    * a_a = sqrt(sqrt(ax^2+ay^2)^2 + az^2)
    * (fed_highway_admin/.../pojo/P1.scala:22, dow/hod derivation at
    * p1Streaming.scala:101-104) with (ax, ay, az) = (value, k, value-k).
    * Identical double expression on the oracle side. */
  def q25JsonKinematics(s: SparkSession, dir: String): DataFrame = {
    val schema = "k BIGINT"
    val ax = col("value")
    val ay = col("k").cast("double")
    val az = col("value") - col("k").cast("double")
    val inner = sqrt(ax * ax + ay * ay)
    Tables.events(s, dir)
      .select(col("event_id"), col("value"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL(schema))
          .getField("k").as("k"))
      // inner*inner, not pow(inner, 2): Java's pow(x,2.0) and libm's
      // differ by 1 ulp, a bare multiply is identical across engines
      .select(col("event_id"), col("k"),
        sqrt(inner * inner + az * az).as("a_a"))
      .orderBy(col("event_id"))
  }

  private val S = Num.sql

  val queries: Map[String, Q] = Map(
    "q19_csv_ingest" -> (q19CsvIngest _),
    "q20_sessionize" -> (q20Sessionize _),
    "q23_search_docs" -> (q23SearchDocs _),
    "q25_json_kinematics" -> (q25JsonKinematics _))

  val oracleSql: Map[String, String] = Map(
    // Oracle states the post-tolerance semantics directly over orders:
    // drop the malformed lines (orderkey%50=0), default the emptied field.
    "q19_csv_ingest" ->
      s"""SELECT status, count(*) AS cnt, ${S.moneySum("o_totalprice")} AS sum_total FROM (
         |  SELECT CASE WHEN o_orderkey % 37 = 0 THEN '0' ELSE o_orderstatus END AS status,
         |         o_totalprice
         |  FROM orders WHERE o_orderkey % 50 <> 0) t
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q20_sessionize" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events
         |), marked AS (
         |  SELECT user_id, event_id, ts_us, value,
         |    CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
         |         WHEN ts_us - lag(ts_us) OVER w > 43200000000 THEN 1
         |         ELSE 0 END AS new_sess
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
         |), sess AS (
         |  SELECT user_id, event_id, ts_us, value,
         |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM marked)
         |SELECT user_id, session_id, count(*) AS n_events,
         |  min(ts_us) AS start_us, max(ts_us) AS end_us,
         |  ${S.moneySum("value")} AS sum_value
         |FROM sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q25_json_kinematics" ->
      """WITH e AS (
        |  SELECT event_id, value, CAST(props->>'k' AS BIGINT) AS k,
        |    sqrt(value * value
        |      + CAST(CAST(props->>'k' AS BIGINT) AS DOUBLE)
        |        * CAST(CAST(props->>'k' AS BIGINT) AS DOUBLE)) AS inner_m,
        |    value - CAST(CAST(props->>'k' AS BIGINT) AS DOUBLE) AS az
        |  FROM events)
        |SELECT event_id, k, sqrt(inner_m * inner_m + az * az) AS a_a
        |FROM e ORDER BY event_id""".stripMargin,
    "q23_search_docs" ->
      """SELECT CAST(user_id AS VARCHAR) || ',' || strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS id,
        |  event_id, user_id,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS event_time, value
        |FROM events WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin)
}
