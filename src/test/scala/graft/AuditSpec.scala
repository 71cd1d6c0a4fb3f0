package graft

import graft.operators.Audit
import org.scalatest.funsuite.AnyFunSuite

/** q100/q101 law tests: the CDC diff must account for every key and
  * prove the append-only invariant; the constraint report must count
  * planted violations exactly and report clean constraints as explicit
  * zero rows. */
class AuditSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("q100 pins all four ops, proves append-only, accounts every key") {
    val out = Audit.q100SnapshotDiff(spark, "/root/testdata/sf0.001").collect()
    assert(out.map(_.getString(0)).toSeq ==
      Seq("ADDED", "CHANGED", "REMOVED", "UNCHANGED"))
    val byOp = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // append-only store: nothing is ever REMOVED — and the report
    // PROVES it rather than omitting the row
    assert(byOp("REMOVED") == ((0L, 0L, 0.0)))
    // UNCHANGED keys by definition have zero delta
    assert(byOp("UNCHANGED")._2 == 0L && byOp("UNCHANGED")._3 == 0.0)
    // every v2 key is accounted for exactly once across ADDED/CHANGED/
    // UNCHANGED (v1 ⊆ v2 keys in an append-only world)
    val v2Keys = Tables.orders(spark, "/root/testdata/sf0.001")
      .filter($"o_orderdate" < "1998-01-01")
      .select($"o_custkey").distinct().count()
    assert(byOp("ADDED")._1 + byOp("CHANGED")._1 + byOp("UNCHANGED")._1 == v2Keys)
    assert(byOp("ADDED")._1 > 0 && byOp("CHANGED")._1 > 0,
      "degenerate diff: no adds or changes between the two cutoffs")
  }

  test("q101 counts planted violations exactly; clean constraints report 0") {
    // (doc_id, text, lang, source, n_chars) with one planted breach per
    // constraint — and row 1 clean on every axis
    val docs = Seq[(java.lang.Long, String, String, String, java.lang.Long)](
      (1L, "good text", "en", "srcA", 9L),       // clean
      (2L, "dup id", "de", "srcA", 6L),          // dup pair (rows 2+3)
      (2L, "dup id", "de", "srcA", 6L),
      (3L, "", "fr", "srcA", 0L),                // empty text
      (4L, "bad lang", "xx", "srcA", 8L),        // off-taxonomy lang
      (5L, "bad count", "es", "srcA", 99L),      // n_chars mismatch
      (6L, "no source", "zh", null, 9L),         // null source
      (null, "no id", "en", "srcA", 5L)          // null doc_id
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rep = Audit.constraintReport(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(rep("doc_id_not_null") == ((1L, 8L, "fail")))
    assert(rep("doc_id_unique") == ((2L, 8L, "fail"))) // both dup ROWS count
    assert(rep("lang_in_taxonomy") == ((1L, 8L, "fail")))
    assert(rep("n_chars_consistent") == ((1L, 8L, "fail")))
    assert(rep("source_not_null") == ((1L, 8L, "fail")))
    assert(rep("text_nonempty") == ((1L, 8L, "fail")))
  }

  test("q103 weights are a normalized partition of the discounted mass") {
    val rows = Audit.q103SourceWeights(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2),
        s"distinct chars exceed total for ${r.getString(0)}")
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000000L,
        s"mean quality out of [0, 1e6] for ${r.getString(0)}")
      assert(r.getLong(5) <= r.getLong(3),
        s"effective chars exceed distinct for ${r.getString(0)}")
    }
    // floor-divided ppm shares must sum to 1e6 minus at most one ulp
    // per source (each floor loses < 1 ppm)
    val wsum = rows.map(_.getLong(6)).sum
    assert(wsum <= 1000000L && wsum > 1000000L - rows.length,
      s"weights do not partition ppm space: $wsum over ${rows.length} sources")
  }

  test("q107 propagates a planted deletion batch through the key chain exactly") {
    // customers 7 and 27 match the erasure predicate; 8 fails the key
    // rule, 17 fails the segment rule
    val customer = Seq(
      (7L, "AUTOMOBILE"), (17L, "BUILDING"), (27L, "AUTOMOBILE"),
      (8L, "AUTOMOBILE")).toDF("c_custkey", "c_mktsegment")
    val orders = Seq(
      (100L, 7L), (101L, 27L), (102L, 8L), (103L, 17L), (104L, 7L))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq(100L, 100L, 101L, 102L, 103L).toDF("l_orderkey")
    val rep = Audit.purgeAudit(customer, orders, lineitem).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rep("customer") == ((2L, 2L, 500000L)), s"customer: $rep")
    assert(rep("orders") == ((3L, 2L, 600000L)), s"orders: $rep")
    // lineitems of orders 100 (x2) and 101 purge; 102's customer is
    // retained, so its lineitem survives even though 8 is AUTOMOBILE
    assert(rep("lineitem") == ((3L, 2L, 600000L)), s"lineitem: $rep")
  }

  test("q107 on the real corpus: purge shares are consistent and plausible") {
    val rows = Audit.q107PurgeAudit(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("customer", "lineitem", "orders"))
    rows.foreach { r =>
      val (p, kept, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(p > 0, s"${r.getString(0)}: empty purge set — degenerate test")
      assert(ppm == p * 1000000L / (p + kept), s"${r.getString(0)} ppm drift")
      // an erasure batch is a sliver of the corpus, never the bulk
      assert(ppm < 200000L, s"${r.getString(0)} purges ${ppm} ppm")
    }
  }

  test("q108 profile drift: complete metric grid, internal arithmetic, non-vacuous windows") {
    val rows = Audit.q108ProfileDrift(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(
      ("_row", "n_rows"), ("event_type", "n_distinct"), ("props", "null_ppm"),
      ("user_id", "n_distinct"), ("value", "max_c"), ("value", "min_c"),
      ("value", "null_ppm")))
    val m = rows.map(r => (r.getString(0), r.getString(1)) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // delta is always v2 - v1
    m.values.foreach { case (v1, v2, d) => assert(d == v2 - v1) }
    // both windows must be populated or every profile is vacuous
    val (r1, r2, _) = m(("_row", "n_rows"))
    assert(r1 > 0 && r2 > 0, s"empty profile window: $r1 / $r2")
    // distincts are bounded by rows; null ppm by the ppm space
    val (u1, u2, _) = m(("user_id", "n_distinct"))
    assert(u1 > 0 && u1 <= r1 && u2 > 0 && u2 <= r2)
    m.collect { case ((_, "null_ppm"), (v1, v2, _)) =>
      assert(v1 >= 0 && v1 <= 1000000L && v2 >= 0 && v2 <= 1000000L)
    }
    val (mn1, mn2, _) = m(("value", "min_c"))
    val (mx1, mx2, _) = m(("value", "max_c"))
    assert(mn1 <= mx1 && mn2 <= mx2, "window extremes inverted")
  }

  test("q111 skew report: internal arithmetic and one counts-shuffle per relation") {
    val out = Audit.q111SkewReport(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("events.user_id", "lineitem.l_orderkey", "orders.o_custkey"))
    rows.foreach { r =>
      val (n, k, mx, top1, hot) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
      assert(k > 0 && k <= n && mx >= 1 && mx <= n)
      assert(top1 == mx * 1000000L / n, s"${r.getString(0)} top1 ppm drift")
      // max >= mean always; a hot key must carry > 10x the mean
      // (division forms — the overflow-safe shape the operator uses)
      assert(mx >= n / k)
      assert(hot >= 0 && hot <= k)
      if (hot > 0) assert(mx > 10L * n / k,
        s"${r.getString(0)} reports hot keys but max is under the threshold")
    }
    // the counts subtree feeds both the totals aggregate and the
    // hot-key filter: exchange reuse must materialize it once
    val reused = out.queryExecution.executedPlan.toString
    assert(reused.contains("ReusedExchange"),
      "counts shuffle not reused — the relation would be scanned twice")
  }

  test("q111 hot-key threshold: strict at exactly 10x mean, trips just above") {
    // key 0 at c plus 10 distinct singles gives n = c + 10, k = 11, so
    // the threshold (10n) div k equals c exactly when c = 100 — the
    // boundary must NOT count (strict >), and c = 101 must
    def frame(c: Int) =
      ((1 to 10).map(i => i.toLong) ++ Seq.fill(c)(0L)).toDF("uid")
    def hotOf(c: Int): Long =
      Audit.skewProfile("t.uid", frame(c), "uid").collect().head.getLong(5)
    assert(hotOf(100) == 0L, "c == 10x mean must not count as hot (strict)")
    assert(hotOf(101) == 1L, "c just above 10x mean must count as hot")
  }

  test("q101 on the real corpus: every constraint passes with non-zero coverage") {
    val rep = Audit.q101ConstraintReport(spark, "/root/testdata/sf0.001").collect()
    assert(rep.length == 6)
    assert(rep.forall(_.getString(3) == "pass"),
      s"violations in generated corpus: ${rep.mkString("; ")}")
    assert(rep.forall(_.getLong(2) > 0))
  }
}
