package graft

import graft.operators.Text
import graft.sources.InvertedIndexStore
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface contract: an analyst typing plain SQL against the
  * registered views gets THE SAME results as the Scala operator paths —
  * the reference's `impala/ny_taxi/bi_*.impala` workflow, served by
  * graft stores. Three semantics from three tiers: a BI aggregate over
  * a base table (q2), an index probe over the persisted posting
  * relation (q86b — through the PRUNED probe view, so the SQL path
  * pays the same manifest file skip), and manifest time travel over
  * the versioned store's as-of views (q109). */
class GraftCatalogSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.01"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("q2 semantics as a SQL string over the registered base tables") {
    GraftCatalog.register(spark, sf)
    val sql = spark.sql(
      """SELECT o_custkey, count(*) AS trip_cnt,
        |  sum(CAST(round((o_totalprice)*100) AS BIGINT))/100.0d AS sum_total
        |FROM orders GROUP BY 1
        |ORDER BY trip_cnt DESC, o_custkey LIMIT 10""".stripMargin)
    assert(rows(sql) == rows(operators.Relational.q2TopkByAgg(spark, sf)),
      "SQL-surface q2 diverged from the operator result")
  }

  test("q86b semantics as a SQL string over the pruned probe view") {
    GraftCatalog.register(spark, sf)
    GraftCatalog.probeView(spark, sf, "graft_probe", Text.Bm25Query)
    val sql = spark.sql(GraftCatalog.bm25Sql("graft_probe", Text.Bm25Query,
      Text.Bm25K1, Text.Bm25B))
    val viaOperator = InvertedIndexStore.q86bBm25Index(spark, sf)
    // bit-identical: same relation, same double arithmetic shape
    assert(rows(sql) == rows(viaOperator),
      "SQL-surface BM25 diverged from the q86b operator result")
    // and the probe view really is pruned: fewer files than the store
    val path = InvertedIndexStore.store(spark, sf)
    val all = spark.read.parquet(path).inputFiles.length
    val pruned = spark.table("graft_probe").inputFiles.length
    assert(pruned < all,
      s"probe view reads $pruned of $all files — manifest skip not applied")
  }

  test("q109 semantics as a SQL string over the as-of version views") {
    GraftCatalog.register(spark, sf)
    val sql = spark.sql(
      """SELECT CAST(1 AS BIGINT) AS version, count(*) AS n_rows,
        |  sum(amount_c) AS amount_c,
        |  count(DISTINCT o_custkey) AS n_customers FROM graft_orders_v1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), count(*), sum(amount_c),
        |  count(DISTINCT o_custkey) FROM graft_orders_v2
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), count(*), sum(amount_c),
        |  count(DISTINCT o_custkey) FROM graft_orders_v3
        |ORDER BY version""".stripMargin)
    assert(rows(sql) == rows(sources.VersionedStore.q109TimeTravel(spark, sf)),
      "SQL-surface time travel diverged from the q109 operator result")
  }
}
