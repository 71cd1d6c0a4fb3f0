package graft.operators

import graft.{Num, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's stateful-entity core, in batch form.
  *
  * Origins (reference file:line):
  *  - q21: ny_taxi/NyTaxiYellowTripStreaming.scala:139-161 — the
  *    `updateStateByKey` fold producing a per-vendor entity with
  *    New / Modified / Untouched state per micro-batch. Batch framing:
  *    "state" = orders before the cutoff date, "batch" = orders after;
  *    one hash aggregate derives both the merged entity and the state.
  *  - q22: NyTaxiYellowTripStreaming.scala:214-266 sendEntityToKudu —
  *    `newInsert()` for New, `newUpdate()` for Modified, nothing for
  *    Untouched. Expressed as the keyed merge a foreachBatch sink runs:
  *    full-outer join of the stored aggregate with the delta aggregate,
  *    emitting only the rows that would be written.
  *
  * The streaming twin of this logic is
  * [[graft.streaming.EntityStream]] (flatMapGroupsWithState).
  */
object Entity extends QueryPack {
  import Num.cents

  private val cutoff = "1998-01-01"

  /** Single-pass batch equivalent of the running entity state. Every
    * aggregate is partial-aggregable (sum/count/max of conditionals), so
    * the map side combines before the one shuffle on o_custkey. */
  def q21EntityStateBatch(s: SparkSession, dir: String): DataFrame = {
    val isOld = col("o_orderdate") < to_timestamp(lit(cutoff))
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(
        sum(when(isOld, 1L).otherwise(0L)).as("old_trips"),
        sum(when(!isOld, 1L).otherwise(0L)).as("new_trips"),
        count(lit(1)).as("total_trips"),
        (sum(cents(col("o_totalprice"))) / 100.0).as("total_amount"),
        max(col("o_totalprice")).as("max_amount"))
      .withColumn("state",
        when(col("old_trips") === 0, "New")
          .when(col("new_trips") > 0, "Modified")
          .otherwise("Untouched"))
      .select(col("o_custkey"), col("state"), col("total_trips"),
        col("new_trips"), col("total_amount"), col("max_amount"))
      .orderBy(col("o_custkey"))
  }

  /** Keyed upsert merge (the Kudu sink semantics): merge a stored entity
    * table with a delta aggregate, classify INSERT / UPDATE / untouched,
    * and emit only the write batch. Both sides aggregate to one row per
    * key before the join, so the full-outer join shuffles entity-sized
    * data (not raw facts); sums stay in integer cents across the merge so
    * the merged totals are exact. */
  def q22UpsertMerge(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    def agg(df: DataFrame): DataFrame = df
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("trips"),
        sum(cents(col("o_totalprice"))).as("amount_c"),
        max(col("o_totalprice")).as("mx"))
    val store = agg(orders.filter(col("o_orderdate") < to_timestamp(lit(cutoff))))
      .withColumnRenamed("o_custkey", "s_key")
      .withColumnRenamed("trips", "s_trips")
      .withColumnRenamed("amount_c", "s_amount_c")
      .withColumnRenamed("mx", "s_mx")
    val delta = agg(orders.filter(col("o_orderdate") >= to_timestamp(lit(cutoff))))
    store.join(delta, col("s_key") === col("o_custkey"), "full_outer")
      .filter(col("o_custkey").isNotNull) // untouched rows write nothing
      .select(
        col("o_custkey"),
        when(col("s_key").isNull, "INSERT").otherwise("UPDATE").as("op"),
        (coalesce(col("s_trips"), lit(0L)) + col("trips")).as("total_trips"),
        ((coalesce(col("s_amount_c"), lit(0L)) + col("amount_c")) / 100.0).as("total_amount"),
        greatest(coalesce(col("s_mx"), col("mx")), col("mx")).as("max_amount"))
      .orderBy(col("o_custkey"))
  }

  private val S = Num.sql

  val queries: Map[String, Q] = Map(
    "q21_entity_state_batch" -> (q21EntityStateBatch _),
    "q22_upsert_merge" -> (q22UpsertMerge _))

  val oracleSql: Map[String, String] = Map(
    "q21_entity_state_batch" ->
      s"""SELECT o_custkey,
         |  CASE WHEN sum(CASE WHEN o_orderdate < TIMESTAMP '$cutoff' THEN 1 ELSE 0 END) = 0 THEN 'New'
         |       WHEN sum(CASE WHEN o_orderdate >= TIMESTAMP '$cutoff' THEN 1 ELSE 0 END) > 0 THEN 'Modified'
         |       ELSE 'Untouched' END AS state,
         |  count(*) AS total_trips,
         |  CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '$cutoff' THEN 1 ELSE 0 END) AS BIGINT) AS new_trips,
         |  ${S.moneySum("o_totalprice")} AS total_amount,
         |  max(o_totalprice) AS max_amount
         |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q22_upsert_merge" ->
      s"""WITH store AS (
         |  SELECT o_custkey AS s_key, count(*) AS s_trips,
         |    CAST(sum(${S.cents("o_totalprice")}) AS BIGINT) AS s_amount_c,
         |    max(o_totalprice) AS s_mx
         |  FROM orders WHERE o_orderdate < TIMESTAMP '$cutoff' GROUP BY 1
         |), delta AS (
         |  SELECT o_custkey, count(*) AS trips,
         |    CAST(sum(${S.cents("o_totalprice")}) AS BIGINT) AS amount_c,
         |    max(o_totalprice) AS mx
         |  FROM orders WHERE o_orderdate >= TIMESTAMP '$cutoff' GROUP BY 1)
         |SELECT o_custkey,
         |  CASE WHEN s_key IS NULL THEN 'INSERT' ELSE 'UPDATE' END AS op,
         |  coalesce(s_trips, 0) + trips AS total_trips,
         |  (coalesce(s_amount_c, 0) + amount_c) / 100.0 AS total_amount,
         |  greatest(coalesce(s_mx, mx), mx) AS max_amount
         |FROM store FULL OUTER JOIN delta ON s_key = o_custkey
         |WHERE o_custkey IS NOT NULL
         |ORDER BY o_custkey""".stripMargin)
}
