package graft

import graft.sources.{Expectations, VersionedStore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write-path expectation contracts beyond the q131 gate: conservation
  * (no row lost or duplicated across the split), first-failing label
  * order, zero-overhead pass-through, commit atomicity of the
  * quarantine relation, and the SQL declare/read surface. */
class ExpectationsSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def freshPath(name: String): String = {
    val p = Engine.storePath(name, dir)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    p
  }

  private def customers = Tables.customer(spark, dir)
    .select(col("c_custkey"), col("c_mktsegment"),
      Num.cents(col("c_acctbal")).as("acct_c"))

  test("split conserves rows and labels with the FIRST failing rule") {
    val path = freshPath("graft-expect-order")
    // rule order matters: negative AUTOMOBILE rows violate BOTH; the
    // declared order makes 'acct_nonneg' win
    Expectations.declare(spark, path, Seq(
      ("acct_nonneg", "acct_c >= 0"),
      ("not_auto_debt", "NOT (c_mktsegment = 'AUTOMOBILE' AND acct_c < 0)")))
    val v = Expectations.guardedAppend(spark, path, customers, "c_custkey", 2)
    val stored = VersionedStore.readVersion(spark, path, v)
    val rejects = Expectations.quarantine(spark, path, v)
    assert(stored.count() + rejects.count() == customers.count())
    assert(stored.filter(col("acct_c") < 0).count() == 0)
    // every reject carries the first rule's name — rule 2 never fires
    // because rule 1 already rejected every row rule 2 would
    assert(rejects.groupBy(col("violated")).count().collect()
      .map(r => r.getString(0)).toSeq == Seq("acct_nonneg"))
    // conservation down to values: stored ∪ quarantined == input
    val reunion = stored.unionByName(rejects.drop("violated"))
    assert(reunion.exceptAll(customers).isEmpty &&
      customers.exceptAll(reunion).isEmpty)
  }

  test("a NULL-evaluating predicate QUARANTINES (round-16 advice: " +
      "non-true fails, the DLT rule)") {
    val path = freshPath("graft-expect-null")
    Expectations.declare(spark, path, Seq(("acct_nonneg", "acct_c >= 0")))
    // null out a known slice of balances: 'acct_c >= 0' evaluates to
    // NULL there — silently committing those rows would be the finding
    val nulled = customers.withColumn("acct_c",
      when(col("c_custkey") % 7 === 0, lit(null).cast("long"))
        .otherwise(col("acct_c")))
    val v = Expectations.guardedAppend(spark, path, nulled, "c_custkey", 2)
    val stored = VersionedStore.readVersion(spark, path, v)
    val rejects = Expectations.quarantine(spark, path, v)
    assert(stored.filter(col("acct_c").isNull).count() == 0,
      "a NULL-evaluating predicate committed its rows")
    assert(rejects.filter(col("acct_c").isNull)
      .filter(col("violated") === "acct_nonneg").count() ==
      nulled.filter(col("acct_c").isNull).count())
    assert(stored.count() + rejects.count() == nulled.count())
  }

  test("no declared expectations = plain append, no quarantine relation") {
    val path = freshPath("graft-expect-plain")
    val v = Expectations.guardedAppend(spark, path, customers, "c_custkey", 2)
    assert(VersionedStore.readVersion(spark, path, v).count() ==
      customers.count())
    val q = Expectations.quarantine(spark, path, v)
    assert(q.count() == 0 && q.columns.contains("violated"))
  }

  test("quarantine is committed-gated and reclaimed with a crashed slot") {
    val path = freshPath("graft-expect-crash")
    Expectations.declare(spark, path, Seq(("acct_nonneg", "acct_c >= 0")))
    val v = Expectations.guardedAppend(spark, path, customers, "c_custkey", 2)
    // an uncommitted slot's orphan quarantine (writer crashed after the
    // quarantine write, before the marker): unreadable, then reclaimed
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphan = v + 1
    fs.create(new org.apache.hadoop.fs.Path(path + s"/claims/v$orphan"),
      true).close()
    Expectations.quarantine(spark, path, v).limit(1).count() // committed ok
    intercept[IllegalArgumentException] {
      Expectations.quarantine(spark, path, orphan)
    }
    spark.range(1).select(lit("x").as("violated")).write
      .parquet(Expectations.quarantinePath(path, orphan))
    VersionedStore.vacuum(spark, path, keepVersions = 10, claimGraceMs = 0L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      Expectations.quarantinePath(path, orphan))),
      "crashed slot's quarantine must be reclaimed")
    // expired versions drop their quarantine with their manifests
    Expectations.guardedAppend(spark, path,
      customers.filter(col("acct_c") < 0), "c_custkey", 1)
    VersionedStore.vacuum(spark, path, keepVersions = 1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      Expectations.quarantinePath(path, v))))
  }

  test("SQL surface: graft_store_expect declares, graft_quarantine reads") {
    val path = freshPath("graft-expect-sql")
    val esc = path.replace("'", "''")
    GraftCatalog.call(spark,
      s"CALL graft_store_expect('versioned', '$esc', 'acct_nonneg', " +
        "'acct_c >= 0')")
    GraftCatalog.call(spark,
      s"CALL graft_store_expect('versioned', '$esc', 'has_segment', " +
        "'c_mktsegment IS NOT NULL')")
    assert(Expectations.declared(spark, path).map(_._1) ==
      Seq("acct_nonneg", "has_segment"))
    val v = Expectations.guardedAppend(spark, path, customers, "c_custkey", 2)
    val viaTvf = spark.sql(
      s"SELECT violated, count(*) AS n FROM graft_quarantine('$esc', $v) " +
        "GROUP BY violated ORDER BY violated").collect()
    assert(viaTvf.length == 1 && viaTvf(0).getString(0) == "acct_nonneg")
    assert(viaTvf(0).getLong(1) ==
      customers.filter(col("acct_c") < 0).count())
  }
}
