package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, KeyValueGroupedDataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2.B stateful streaming — Structured Streaming twins of the
  * reference's DStream jobs. Each builder takes a typed input Dataset
  * (MemoryStream in specs, Kafka/file readStream in production — the
  * seam is the Dataset, exactly where Spark wants it) and returns the
  * transformed streaming Dataset.
  *
  * Origins (reference file:line):
  *  - s1: ny_taxi/NyTaxiYellowTripStreaming.scala:139-161 —
  *    updateStateByKey folding trips into a per-vendor entity with
  *    New/Modified state. Structured Streaming calls the state function
  *    only for keys present in the micro-batch, so Untouched entities
  *    simply emit nothing — which is also exactly what the reference's
  *    sink writes for them (sendEntityToKudu skips state "Untouched").
  *  - s2: connected_car/ConnectedCarStreaming.scala:50-75 — per-VIN
  *    profile with incremental averages, insert-vs-update flag, and the
  *    store-seeded initial state (:217 loadOriginalKuduProfilesData →
  *    initialRDD) mapped to flatMapGroupsWithState's initialState.
  *  - s3: the windowed micro-batch counting every DStream job does
  *    implicitly, as an event-time tumbling window with a watermark.
  */
object Streams {

  // ---- s1: entity stream ----

  case class OrderEvent(custkey: Long, amount: Double, status: String)
  case class EntityState(totalTrips: Long, totalAmountC: Long, maxAmount: Double,
      openTrips: Long, fulfilledTrips: Long)
  case class EntityUpdate(custkey: Long, state: String, totalTrips: Long,
      totalAmount: Double, maxAmount: Double, openTrips: Long, fulfilledTrips: Long)

  private def cents(x: Double): Long = math.round(x * 100)

  private def foldEntity(st: EntityState, e: OrderEvent): EntityState =
    EntityState(
      st.totalTrips + 1,
      st.totalAmountC + cents(e.amount),
      math.max(st.maxAmount, e.amount),
      st.openTrips + (if (e.status == "O") 1 else 0),
      st.fulfilledTrips + (if (e.status == "F") 1 else 0))

  val emptyEntity: EntityState = EntityState(0L, 0L, Double.MinValue, 0L, 0L)

  /** The updateStateByKey fold: New on first sight, Modified after. */
  def updateEntity(key: Long, events: Iterator[OrderEvent],
      gs: GroupState[EntityState]): Iterator[EntityUpdate] = {
    val had = gs.exists
    val st = events.foldLeft(gs.getOption.getOrElse(emptyEntity))(foldEntity)
    gs.update(st)
    Iterator.single(EntityUpdate(key, if (had) "Modified" else "New",
      st.totalTrips, st.totalAmountC / 100.0, st.maxAmount,
      st.openTrips, st.fulfilledTrips))
  }

  def entityStream(in: Dataset[OrderEvent]): Dataset[EntityUpdate] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.custkey)
      .flatMapGroupsWithState[EntityState, EntityUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(updateEntity)
  }

  // ---- s2: profile stream with seeded initial state ----

  case class Reading(vin: String, accel: Double, brake: Double)
  case class Profile(n: Long, accelScore: Double, brakeScore: Double)
  case class ProfileUpdate(vin: String, isInsert: Boolean, n: Long,
      accelScore: Double, brakeScore: Double, maintenancePeriod: Long)

  /** Incremental average, the ConnectedCarProfile.addReading fold. */
  private def foldProfile(p: Profile, r: Reading): Profile =
    Profile(p.n + 1,
      (p.accelScore * p.n + r.accel) / (p.n + 1),
      (p.brakeScore * p.n + r.brake) / (p.n + 1))

  /** Derived maintenance period: aggressive profiles halve the base
    * period (the oilReplacementPeriod rule family). */
  private def maintenance(p: Profile): Long =
    if (p.accelScore > 2.0 || p.brakeScore > 2.0) 2500L else 5000L

  def updateProfile(vin: String, rs: Iterator[Reading],
      gs: GroupState[Profile]): Iterator[ProfileUpdate] = {
    val had = gs.exists
    val p = rs.foldLeft(gs.getOption.getOrElse(Profile(0L, 0.0, 0.0)))(foldProfile)
    gs.update(p)
    Iterator.single(ProfileUpdate(vin, !had, p.n, p.accelScore, p.brakeScore,
      maintenance(p)))
  }

  /** `initial` is the store-loaded profile snapshot (the reference's
    * initialRDD from Kudu); keys present there are updates, never
    * inserts, from the first batch on. */
  def profileStream(in: Dataset[Reading],
      initial: KeyValueGroupedDataset[String, Profile]): Dataset[ProfileUpdate] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.vin)
      .flatMapGroupsWithState[Profile, ProfileUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout(), initial)(updateProfile)
  }

  // ---- s6: timeout-closed streaming sessions ----

  case class SessEvent(userId: Long, ts: java.sql.Timestamp, value: Double)
  case class SessState(startUs: Long, endUs: Long, n: Long, sumC: Long)
  case class SessionOut(userId: Long, startUs: Long, endUs: Long, n: Long,
      sumValue: Double, closedBy: String)

  /** Streaming twin of q20's gap sessionization, and the trip-closing
    * semantics of TripSummaryStreaming: a user's open session extends
    * with each event; when the event-time watermark passes
    * session_end + gap, the EventTimeTimeout fires and the closed
    * session is emitted ("timeout"). Gaps observable inside one batch
    * close immediately ("gap"). State is one small struct per active
    * user and the store drops it at timeout — bounded by concurrently
    * active users, not history. */
  def updateSession(gapUs: Long)(userId: Long, events: Iterator[SessEvent],
      gs: GroupState[SessState]): Iterator[SessionOut] = {
    def out(st: SessState, why: String) =
      SessionOut(userId, st.startUs, st.endUs, st.n, st.sumC / 100.0, why)
    if (gs.hasTimedOut) {
      val st = gs.get
      gs.remove()
      Iterator.single(out(st, "timeout"))
    } else {
      val sorted = events.toVector.sortBy(e => (e.ts.getTime, e.value))
      var closed = Vector.empty[SessionOut]
      var cur = gs.getOption
      sorted.foreach { e =>
        val us = e.ts.getTime * 1000
        cur match {
          case Some(st) if us - st.endUs > gapUs =>
            closed :+= out(st, "gap")
            cur = Some(SessState(us, us, 1, cents(e.value)))
          case Some(st) =>
            cur = Some(SessState(st.startUs, math.max(st.endUs, us),
              st.n + 1, st.sumC + cents(e.value)))
          case None =>
            cur = Some(SessState(us, us, 1, cents(e.value)))
        }
      }
      cur.foreach { st =>
        gs.update(st)
        gs.setTimeoutTimestamp(st.endUs / 1000 + gapUs / 1000)
      }
      closed.iterator
    }
  }

  def sessionStream(in: Dataset[SessEvent], gapMinutes: Int,
      watermarkDelay: String = "0 seconds"): Dataset[SessionOut] = {
    import in.sparkSession.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000
    in.withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        updateSession(gapUs))
  }

  // ---- s7: streaming exact dedup at the ingest boundary ----

  case class DocEvent(contentHash: Long, ts: java.sql.Timestamp, docId: Long)

  /** Streaming twin of q40's exact dedup — drop re-ingested duplicates
    * (replayed topics, double-published files) AT the ingest boundary,
    * keyed by content hash. dropDuplicatesWithinWatermark keeps one
    * state row per distinct hash only until the event-time watermark
    * passes it, so state is bounded by the dedup horizon, not corpus
    * history — the property that makes this runnable forever at 100 TB/
    * day (an unbounded dropDuplicates would accrete state without
    * limit). */
  def dedupStream(in: Dataset[DocEvent], horizon: String): Dataset[DocEvent] =
    in.withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("contentHash")

  // ---- s8: stream-stream interval join (NRT attribution) ----

  case class ClickEv(userId: Long, clickId: Long, ts: java.sql.Timestamp)
  case class PurchaseEv(userId: Long, purchaseId: Long,
      ts: java.sql.Timestamp, amount: Double)

  /** Streaming twin of q26's attribution as a watermarked stream-stream
    * interval join: every purchase pairs with the same user's clicks in
    * the `lookback` window before it. The time-range join condition plus
    * the watermark let Spark expire both sides' join state (a click can
    * stop matching once the purchase watermark passes click_ts +
    * lookback), so state is bounded by the horizon, not stream history —
    * the property that makes the join runnable forever. Emits ALL
    * candidate pairs (append mode); exact last-click attribution is the
    * batch tier (q26), the same exact-vs-streaming split as q40/s7. */
  def attributionJoin(clicks: Dataset[ClickEv], purchases: Dataset[PurchaseEv],
      lookback: String = "1 hour",
      delay: String = "10 minutes"): org.apache.spark.sql.DataFrame = {
    val c = clicks.toDF().withWatermark("ts", delay)
      .select(col("userId").as("c_user"), col("clickId"),
        col("ts").as("click_ts"))
    val p = purchases.toDF().withWatermark("ts", delay)
      .select(col("userId"), col("purchaseId"), col("ts").as("purchase_ts"),
        col("amount"))
    p.join(c,
      col("userId") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $lookback"))
      .select(col("purchaseId"), col("userId"), col("clickId"),
        col("click_ts"), col("purchase_ts"), col("amount"))
  }

  // ---- s9: NRT decontamination gate at the ingest boundary ----

  case class IncomingDoc(docId: Long, text: String)

  /** Streaming twin of q66b — the decontamination guard a pipeline runs
    * ON the ingest stream: every incoming document's word 3-grams are
    * probed against the (batch-built, broadcast) train-shingle bloom
    * filter, and documents whose overlap upper bound crosses the
    * threshold are flagged before they ever reach the store.
    *
    * Deliberately STATELESS: the bloom binary rides into the plan as a
    * literal (one bounded buffer per executor, like a broadcast hash
    * relation), the probe is a per-row column expression, and the
    * stream needs no watermark, no state store, no shuffle — the only
    * streaming shape that keeps an ingest guard at line rate forever.
    * Bloom semantics carry over from q66b: no false negatives (every
    * truly leaked document is flagged), FPP-bounded over-flagging.
    * Rebuilding/refreshing the filter as the train corpus grows is a
    * batch concern (re-run [[graft.operators.Dedup.trainShingleBloom]]
    * and restart the query — the standard broadcast-refresh pattern). */
  def decontamGate(in: Dataset[IncomingDoc], bloomBytes: Array[Byte],
      threshold: Double = 0.5): org.apache.spark.sql.DataFrame = {
    val sh = array_distinct(graft.functions.TextOps.shingles3(
      graft.functions.TextOps.toks(lower(col("text")))))
    in.toDF()
      .withColumn("sh", sh)
      .withColumn("n_shingles", size(col("sh")).cast("long"))
      .withColumn("n_maybe_overlap",
        size(filter(col("sh"), g =>
          graft.operators.Dedup.bloomMaybe(bloomBytes, xxhash64(g)))).cast("long"))
      .withColumn("overlap_frac_ub",
        when(col("n_shingles") > 0,
          col("n_maybe_overlap").cast("double") / col("n_shingles")))
      .withColumn("flagged",
        coalesce(col("overlap_frac_ub") >= threshold, lit(false)))
      .drop("sh")
  }

  // ---- s12: NRT quality gate (q90's APPLY at the ingest boundary) ----

  /** Streaming twin of q90's scoring half — the quality filter a
    * pretraining ingest runs ON the stream: every incoming document is
    * featurized row-locally (the SAME
    * [[graft.operators.MlStats.withQualityFeatures]] definition the
    * batch trainer used — no train/serve skew) and scored against the
    * batch-trained weight vector riding in as literals. Deliberately
    * STATELESS like s9: no watermark, no state store, no shuffle —
    * line-rate forever; refreshing the model is a batch retrain +
    * query restart (the broadcast-refresh pattern). */
  def qualityGate(in: Dataset[IncomingDoc], weights: Array[Double],
      threshold: Double = 0.5): org.apache.spark.sql.DataFrame = {
    graft.operators.MlStats.withQualityFeatures(in.toDF())
      .withColumn("score", graft.ml.Logistic.scoreExpr(
        graft.operators.MlStats.QualityFeatureNames, weights))
      .withColumn("accepted", col("score") >= threshold)
      .drop(graft.operators.MlStats.QualityFeatureNames: _*)
  }

  // ---- s16: NRT erasure gate (q107's enforcement twin) ----

  case class UserEvent(userId: Long, eventId: Long, value: Double)

  /** Streaming enforcement of an accepted erasure batch — the NRT half
    * of q107's story: the audit report sizes the purge, batch jobs
    * rewrite history, and THIS gate keeps rows for erased entities from
    * landing in any store while that rewrite runs (and after). The
    * tombstone list arrives as a STATIC keyed frame (the erasure store
    * the batch purge also reads); the stream-static left join
    * broadcasts it, so the gate is stateless — no watermark, no state
    * store, no stream-side shuffle (the s9/s12 line-rate contract;
    * zero state operators are spec-asserted). Matching is EXACT by
    * construction (an erasure gate tolerates neither false positives
    * nor false negatives, so no bloom tier exists here). New erasure
    * batches refresh by query restart — the broadcast-refresh pattern.
    * Emits every row with a `purged` flag rather than dropping
    * silently, so the caller splits retained rows from the per-batch
    * purge counters that continue q107's audit into the stream. */
  def purgeGate(in: Dataset[UserEvent], tombstones: org.apache.spark.sql.DataFrame,
      keyCol: String = "k"): org.apache.spark.sql.DataFrame = {
    // normalize the caller's key column to an internal name that cannot
    // collide with the stream's schema — the gate is robust to any
    // single-key tombstone shape, not just frames already named "k"
    val tomb = broadcast(
      tombstones.select(col(keyCol).as("__graft_tomb_k")).distinct())
    in.toDF()
      .join(tomb, col("userId") === col("__graft_tomb_k"), "left_outer")
      .withColumn("purged", col("__graft_tomb_k").isNotNull)
      .drop("__graft_tomb_k")
  }

  // ---- s3: watermarked tumbling-window counts ----

  case class TimedEvent(ts: java.sql.Timestamp, eventType: String, value: Double)

  /** Event-time tumbling window with a 1h watermark: the state store
    * drops windows older than the watermark, so state is bounded at
    * scale; counts and exact cent sums per (window, type). */
  def windowedCounts(in: Dataset[TimedEvent]): Dataset[org.apache.spark.sql.Row] = {
    in.toDF()
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("eventType"))
      .agg(count(lit(1)).as("cnt"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(col("w.start").as("win_start"), col("eventType"),
        col("cnt"), col("sum_value"))
  }

  // ---- s11: built-in session windows (the declarative tier of s6) ----

  /** Gap sessionization through Spark's native `session_window` — the
    * declarative twin of s6's flatMapGroupsWithState builder. Both
    * close a session when event time goes quiet for `gap`; choose s6
    * when the session needs custom state/emission semantics (the
    * reference's trip-closing logic), this one when count/sum rollups
    * per session suffice — the state store handles merge/expiry and the
    * watermark bounds state, with zero custom code to maintain.
    * Append mode: sessions emit once, when the watermark closes them. */
  def sessionWindowCounts(in: Dataset[SessEvent], gap: String = "30 minutes",
      delay: String = "1 hour"): Dataset[org.apache.spark.sql.Row] = {
    in.toDF()
      .withWatermark("ts", delay)
      .groupBy(col("userId"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(col("userId"), col("w.start").as("sess_start"),
        col("w.end").as("sess_end"), col("n"), col("sum_value"))
  }

  // ---- s10: NRT source-mix rate monitor ----

  case class MixDoc(ts: java.sql.Timestamp, source: String, nChars: Long)
  case class SourceRate(source: String, expectedDocs: Long)

  /** Streaming tier of q67's mixture report — the live monitor a
    * pretraining ingest runs so a source going dark (crawler broke) or
    * flooding (feed loop) is caught within a window, not at the next
    * batch audit. Per tumbling window and source: doc/char volume plus
    * a rate verdict against the batch-derived expected per-window rate
    * ("low" / "high" when outside ±tol, "dark" rows are simply absent —
    * a downstream anti-join against the rate table surfaces them).
    *
    * Shape: ONE watermarked windowed aggregation (state bounded by the
    * watermark horizon × live sources), then a broadcast stream-static
    * join against the tiny rate table AFTER the aggregate — per-window
    * volumes monitor absolute rates, deliberately not within-window
    * shares, which would need a second stateful aggregation over the
    * window totals for no operational gain. */
  def mixMonitor(in: Dataset[MixDoc], rates: Dataset[SourceRate],
      tol: Double = 0.5): Dataset[org.apache.spark.sql.Row] = {
    in.toDF()
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nChars")).as("n_chars"))
      .join(broadcast(rates.toDF()), Seq("source"), "left")
      .select(col("w.start").as("win_start"), col("source"),
        col("n_docs"), col("n_chars"), col("expectedDocs").as("expected_docs"),
        when(col("expectedDocs").isNull, "unknown")
          .when(col("n_docs") < col("expectedDocs") * (1 - tol), "low")
          .when(col("n_docs") > col("expectedDocs") * (1 + tol), "high")
          .otherwise("ok").as("verdict"))
  }

  // ---- s13: NRT distribution-drift gate (streaming tier of q94) ----

  /** Streaming twin of q94's drift report — the live alarm a training
    * pipeline wants when the CATEGORY MIX of an ingest shifts (s10
    * catches a source going dark or flooding; this catches the subtler
    * failure where total volume looks fine but composition moved).
    * Per tumbling window: every category's count as conditional
    * counters over the KNOWN category list (the fixed-taxonomy
    * assumption a drift monitor makes anyway), so the window total and
    * all shares come out of ONE watermarked stateful aggregation —
    * sidestepping the second stateful agg that per-(window, category)
    * rows would need for shares (s10's deliberate limitation). Shares
    * and the total-variation sum vs the batch-derived baseline
    * (q94-style ppb integers) are then row-local; the verdict trips
    * when TV exceeds the threshold. State is bounded by the watermark
    * horizon; everything downstream of the one aggregate is stateless. */
  def driftGate(in: Dataset[TimedEvent], categories: Seq[String],
      baselinePpb: Map[String, Long], thresholdPpb: Long,
      win: String = "1 hour", delay: String = "1 hour"): org.apache.spark.sql.DataFrame = {
    require(categories.nonEmpty, "driftGate needs at least one category")
    // a baseline key outside the taxonomy would silently drop its mass
    // from every tv comparison — fail loudly at build time instead
    require(baselinePpb.keySet.subsetOf(categories.toSet),
      s"baselinePpb keys outside the category taxonomy: " +
        s"${(baselinePpb.keySet -- categories).mkString(", ")}")
    // counters carry POSITIONAL internal names (n_c0…) so an arbitrary
    // category string ("page-view", "ad.click") can never break the
    // integer-share expr()s below; the category names only surface as
    // (backtick-safe) aliases in the final select.
    val counters = categories.zipWithIndex.map { case (c, i) =>
      count(when(col("eventType") === c, 1)).as(s"n_c$i")
    }
    val tvTerms = categories.zipWithIndex.map { case (c, i) =>
      val share = when(col("n_total") === 0L, 0L)
        .otherwise(expr(s"(n_c$i * 1000000000) div n_total"))
      abs(share - lit(baselinePpb.getOrElse(c, 0L)))
    } :+ {
      // the implicit OTHER category: off-taxonomy events' own share mass
      // (baseline 0 — the taxonomy claims everything). Without this term
      // a pure new-category injection reports HALF the true total-
      // variation distance (the known categories' shrink only), and
      // thresholds calibrated against true TV under-trip.
      val knownSum = categories.indices.map(i => s"n_c$i").mkString(" + ")
      when(col("n_total") === 0L, 0L)
        .otherwise(expr(s"((n_total - ($knownSum)) * 1000000000) div n_total"))
    }
    in.toDF()
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), win).as("w"))
      .agg(counters.head, counters.tail :+ count(lit(1)).as("n_total"): _*)
      .withColumn("tv_sum", tvTerms.reduce(_ + _))
      .withColumn("tv_ppb", expr("tv_sum div 2"))
      .select(col("w.start").as("win_start") +: col("n_total") +:
        categories.zipWithIndex.map { case (c, i) => col(s"n_c$i").as(s"n_$c") } :+
        col("tv_ppb") :+
        (col("tv_ppb") > thresholdPpb).as("drifted"): _*)
  }
}
