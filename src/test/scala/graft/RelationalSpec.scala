package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("every declared query runs and returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracleSql keys without queries: $extra")
  }

  test("q1 rollup has exact group structure") {
    val rows = operators.Relational.q1RollupMeasures(spark, sf).collect()
    assert(rows.length >= 3)
    val pairs = rows.map(r => (r.getString(0), r.getString(1)))
    assert(pairs.distinct.length == pairs.length, "duplicate (returnflag, linestatus) group")
    val flags = pairs.map(_._1).toSet
    assert(Set("A", "N", "R").subsetOf(flags), s"expected flags A/N/R present, got $flags")
  }

  test("q2 topk returns at most 10 ordered by count desc") {
    val rows = operators.Relational.q2TopkByAgg(spark, sf).collect()
    assert(rows.length <= 10)
    val cnts = rows.map(_.getLong(1))
    assert(cnts.sameElements(cnts.sortBy(-_)))
  }

  test("q81 SCD2 intervals tile each user's timeline with one open row") {
    val rows = operators.Relational.q81Scd2(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, rs) =>
      val ordered = rs.sortBy(_._3)
      // consecutive runs must alternate attribute values (that is what
      // makes them runs) and chain exactly: to(k) == from(k+1)
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"user $user gap: $a -> $b")
          assert(a._2 != b._2, s"user $user adjacent runs share value: $a, $b")
        case _ =>
      }
      assert(ordered.init.forall(_._4.nonEmpty) && ordered.last._4.isEmpty,
        s"user $user must close every run but the last")
      assert(rs.forall(_._5 >= 1))
    }
    // run events must account for every event
    assert(rows.map(_._5).sum == Tables.events(spark, sf).count())
  }

  test("q94 drift report is exact on a planted two-window shift") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q94_events").toFile
    dir.deleteOnExit()
    // ts planted as raw ns longs (the adaptive eventsTs ns path);
    // in µs: early half (ts_us <= mid=550): A,A,A,B — late half: A,B,B,B
    Seq((1L, 100000L, 10L, "A", 1.0), (2L, 200000L, 10L, "A", 1.0),
      (3L, 300000L, 11L, "A", 1.0), (4L, 400000L, 11L, "B", 1.0),
      (5L, 600000L, 12L, "A", 1.0), (6L, 700000L, 12L, "B", 1.0),
      (7L, 800000L, 13L, "B", 1.0), (8L, 1000000L, 13L, "B", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(dir.getAbsolutePath + "/events.parquet")
    val rows = operators.Relational.q94DriftTv(spark, dir.getAbsolutePath)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(5))).toMap
    assert(rows("A") == ((3L, 1L, 500000000L)), s"A row: ${rows("A")}")
    assert(rows("B") == ((1L, 3L, 500000000L)), s"B row: ${rows("B")}")
  }

  test("q94 drift is zero when both halves share one distribution") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q94_flat").toFile
    dir.deleteOnExit()
    // identical A:B = 1:1 mix in each half -> every drift_ppb is 0
    Seq((1L, 100000L, 10L, "A", 1.0), (2L, 200000L, 10L, "B", 1.0),
      (3L, 600000L, 11L, "A", 1.0), (4L, 700000L, 11L, "B", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(dir.getAbsolutePath + "/events.parquet")
    val drifts = operators.Relational.q94DriftTv(spark, dir.getAbsolutePath)
      .collect().map(_.getLong(5))
    assert(drifts.length == 2 && drifts.forall(_ == 0L), drifts.mkString(","))
  }

  test("q9b new-customers complements customers-with-fulfilled-orders") {
    import org.apache.spark.sql.functions.col
    val c = Tables.customer(spark, sf).count()
    val withF = Tables.customer(spark, sf).join(
      Tables.orders(spark, sf).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey")),
      col("c_custkey") === col("o_custkey"), "left_semi").count()
    val anti = operators.Relational.q9bAntiJoin(spark, sf)
      .collect().map(_.getLong(1)).sum
    assert(withF + anti == c)
  }

  test("q112 PIT enrichment: every event lands in its own version, never a later one") {
    val rows = operators.Relational.q112PitEnrich(spark, sf).collect()
    val n = Tables.events(spark, sf).count()
    assert(rows.length == n, "enrichment must cover every fact exactly once")
    rows.foreach { r =>
      // the event that OPENED or extended a run belongs to that run:
      // its own type equals the as-of version's type (a leaked FUTURE
      // version or a stale past one would disagree at every change)
      assert(r.getString(3) == r.getString(4),
        s"event ${r.getLong(0)} enriched with a foreign version")
      assert(r.getLong(5) <= r.getLong(2),
        s"event ${r.getLong(0)} version starts after the event — leakage")
      assert(r.getLong(6) >= 1)
    }
  }

  test("q112b: the store-resident dimension serves the identical PIT enrichment") {
    // the persisted SCD2 store minus its anchor column IS q81's output
    val dim = spark.read.parquet(sources.Scd2Store.store(spark, sf))
      .select(col("user_id"), col("event_type"), col("valid_from_us"),
        col("valid_to_us"), col("n_events"))
    val q81 = operators.Relational.q81Scd2(spark, sf)
    assert(dim.except(q81).isEmpty && q81.except(dim).isEmpty,
      "store content drifted from the q81 derivation")
    // and the store-fed as-of join is bit-identical to the self-derived
    // q112 (both are gated by the same independent-window oracle; this
    // pins them to each other directly too)
    val a = sources.Scd2Store.q112bPitEnrichStore(spark, sf).collect().toSeq
    val b = operators.Relational.q112PitEnrich(spark, sf).collect().toSeq
    assert(a == b, "store-fed PIT enrichment diverged from q112")
  }
}
