package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog-driven materialized-view maintenance — the STREAMING IVM
  * that completes the engine's view-maintenance ladder: q110 refreshes
  * a view from an append commit's manifest diff, q110b retracts across
  * a copy-on-write commit's file diff, and THIS maintains a view from
  * [[ChangelogSink]]'s change images directly — no store read at all,
  * the way a Delta-CDF / Flink-changelog consumer keeps a downstream
  * aggregate current (the view never rescans the base table; it folds
  * the feed).
  *
  * The maintained view here is a per-bucket aggregate over the entity
  * store (bucket = totalTrips div 10): per bucket, entity count and
  * exact integer-cent amount sum. Change images fold as retractable
  * contributions:
  *
  *  - INSERT(after)          → bucket(after)  += (1, amount_after)
  *  - UPDATE(before → after) → bucket(before) −= (1, amount_before)
  *                             bucket(after)  += (1, amount_after)
  *
  * Additive aggregates retract exactly (counts, integer cents), a
  * bucket whose count reaches zero leaves the view (exact retraction
  * semantics, the q110b rule), and because [[ChangelogSink]] drops
  * replay no-ops, a re-delivered batch folds as an EMPTY delta — the
  * view is exactly-once by composition, spec-asserted against the
  * from-scratch aggregate of the store after every batch.
  */
object MvMaintenance {

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  /** The view's definition — the from-scratch aggregate over a store
    * frame (custkey, totalTrips, totalAmount); the spec's oracle and
    * the bootstrap for an empty view. */
  def mvOf(entities: DataFrame): DataFrame =
    entities
      .select(expr("totalTrips div 10").as("bucket"),
        cents(col("totalAmount")).as("ac"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_entities"), sum(col("ac")).as("amount_c"))

  /** Fold one changelog batch (ChangelogSink's images) into the view.
    * One partial-aggregable contribution pass + one bucket-keyed outer
    * merge — both bounded by the view's cardinality and the batch's
    * size, never the store's. */
  def applyChangelog(mv: DataFrame, changelog: DataFrame): DataFrame = {
    val adds = changelog.select(
      expr("trips_after div 10").as("bucket"),
      lit(1L).as("dn"), cents(col("amount_after")).as("dc"))
    val retracts = changelog.filter(col("op") === "UPDATE").select(
      expr("trips_before div 10").as("bucket"),
      lit(-1L).as("dn"), (-cents(col("amount_before"))).as("dc"))
    val delta = adds.unionAll(retracts)
      .groupBy(col("bucket"))
      .agg(sum(col("dn")).as("dn"), sum(col("dc")).as("dc"))
    mv.select(col("bucket"), col("n_entities").as("n0"), col("amount_c").as("a0"))
      .join(delta, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_entities"),
        (coalesce(col("a0"), lit(0L)) + coalesce(col("dc"), lit(0L)))
          .as("amount_c"))
      .filter(col("n_entities") > 0)
  }
}
