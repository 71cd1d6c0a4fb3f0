package graft.sources

import graft.{Engine, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted SCD2 dimension store — q81's validity intervals written as
  * a parquet relation, so the point-in-time join runs against a REAL
  * store-resident dimension instead of re-deriving intervals from the
  * fact frame it enriches (q112's acknowledged harness shortcut — the
  * round-9 review's one structural nit). A feature store keeps exactly
  * this table: dimension history maintained by its own pipeline,
  * consumed by every training job's PIT join.
  *
  * Schema: q81's columns PLUS `anchor_id` — the run's first event id.
  * The anchor is a deliberate store-schema decision, not bloat: two
  * runs can legally share a `valid_from_us` (a type change between
  * same-timestamp events), so a timestamp alone cannot place the
  * version boundary; the anchor pins each version to its position in
  * the per-user event order, which is what makes the as-of union exact
  * (the q112 boundary contract, now carried BY THE STORE). Layout is
  * user-range clustered + sorted, the join's own key.
  *
  * q112b runs the identical as-of mechanism as q112 — interval starts
  * union facts, one user-keyed carry-forward window, one shuffle — but
  * its dimension side is this store's scan: dimension rows ≪ fact rows
  * ride the facts' exchange, nothing fact-sized broadcasts. Gated by
  * the SAME independent-window oracle as q112 (the twin recomputes
  * every event's run attributes with window functions, no join), so a
  * boundary defect in the store schema or the join breaks the hash:
  * ORACLE-EXACT against a store-resident dimension.
  */
object Scd2Store extends QueryPack {

  /** q81's derivation + the anchor id, from a raw events frame. */
  def scd2WithAnchor(events: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val wRun = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from_us"), col("run_id"))
    val prev = lag(col("event_type"), 1).over(wOrd)
    events
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .withColumn("chg",
        when(prev.isNull || prev =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("run_id",
        sum(col("chg")).over(wOrd.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col("user_id"), col("run_id"), col("event_type"))
      .agg(min(col("ts_us")).as("valid_from_us"),
        min(struct(col("ts_us"), col("event_id"))).as("first"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(wRun))
      .select(col("user_id"), col("event_type"), col("valid_from_us"),
        col("valid_to_us"), col("n_events"),
        col("first.event_id").as("anchor_id"))
  }

  def build(events: DataFrame, path: String, files: Int = 8): Unit =
    scd2WithAnchor(events)
      .repartitionByRange(files, col("user_id"))
      .sortWithinPartitions("user_id", "valid_from_us", "anchor_id")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Per-JVM store cache — the store-family amortization contract. */
  private val built = scala.collection.mutable.Map.empty[String, String]

  def store(s: SparkSession, dir: String): String = synchronized {
    built.getOrElseUpdate(dir, {
      val path = Engine.storePath("graft-scd2-store", dir)
      build(Tables.eventsTs(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("event_type")), path)
      path
    })
  }

  /** q112b: the PIT enrichment against the PERSISTED dimension — the
    * q112 as-of union fed by this store's scan. One user-keyed shuffle;
    * the dimension rows enter the union straight off their clustered
    * files. */
  def q112bPitEnrichStore(s: SparkSession, dir: String): DataFrame = {
    val dim = s.read.parquet(store(s, dir))
    val dims = dim.select(col("user_id"),
      col("valid_from_us").as("ts_us"),
      col("anchor_id").as("ord_id"), lit(0L).as("kind"),
      col("event_type").as("d_type"),
      col("valid_from_us").as("d_from"), col("n_events").as("d_n"),
      lit(null).cast("long").as("event_id"),
      lit(null).cast("string").as("event_type"))
    val facts = Tables.eventsTs(s, dir)
      .select(col("user_id"), col("ts_us"), col("event_id").as("ord_id"),
        lit(1L).as("kind"), lit(null).cast("string").as("d_type"),
        lit(null).cast("long").as("d_from"), lit(null).cast("long").as("d_n"),
        col("event_id"), col("event_type"))
    // per user: (ts, anchor/event id, kind) places each version row
    // immediately before its own first event — the q112 boundary rule,
    // satisfied here by STORED columns alone
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

  val queries: Map[String, Q] = Map(
    "q112b_pit_enrich_store" -> (q112bPitEnrichStore _))

  // the SAME independent-window twin that gates q112: the oracle never
  // joins, so it gates the store schema + as-of mechanism end-to-end
  val oracleSql: Map[String, String] = Map(
    "q112b_pit_enrich_store" ->
      graft.operators.Relational.oracleSql("q112_pit_enrich"))
}
