package graft.operators

import graft.{QueryPack, Tables}
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.C sampling / mixture operators over the documents table — the
  * "materialize a training mix" tier on top of the audit-only q47/q67.
  *
  *  - q74: deterministic exact-n reservoir per stratum. q47 samples by
  *    RATE (keep-probability per stratum, size varies with the data);
  *    this draws an exact quota per stratum, the contract a curation
  *    run needs when downstream capacity is fixed ("20 eval docs per
  *    language, same ones on every rerun/engine").
  *  - q75: mixture materialization under target source weights — the
  *    step after q67's mixture REPORT: given per-source sampling
  *    weights, pick the exact per-source quota (capped by
  *    availability) and log the achieved mix.
  *
  * Both pick "the quota smallest salted portable hashes" per stratum
  * (hash order = uniform random order, stable across engines — the q35
  * assignment idea turned into an order), through [[BottomKByHash]]:
  * partial-aggregable bounded state, k rows per (task, stratum) cross
  * the shuffle. The row_number window the oracle uses would sort every
  * row of a stratum through one task — the same scale trap q10
  * documents — and the 61-bit hashes cannot ride [[TopKByScore]]'s
  * double score (53-bit mantissa).
  */
object Sampling extends QueryPack {

  private def saltedHash(salt: String) =
    TextOps.polyHash61(concat(lit(salt), col("doc_id").cast("string")))

  /** Exact-n deterministic reservoir: the 20 smallest-hash docs per
    * lang, ranked. Output is the drawn sample itself (lang, rank,
    * doc_id) — reproducible row-for-row anywhere. */
  def q74ReservoirSample(s: SparkSession, dir: String): DataFrame =
    reservoirFrom(Tables.documents(s, dir))

  private[graft] def reservoirFrom(docs: DataFrame): DataFrame = {
    val bk = udaf(new BottomKByHash(20))
    docs
      .select(col("lang"), col("doc_id"), saltedHash("res-salt-").as("hk"))
      .groupBy(col("lang"))
      .agg(bk(col("hk"), col("doc_id"), lit(0L)).as("sel"))
      .select(col("lang"), posexplode(col("sel")).as(Seq("pos", "t")))
      .select(col("lang"), (col("pos") + 1).cast("long").as("rk"),
        col("t.id").as("doc_id"))
      .orderBy(col("lang"), col("rk"))
  }

  /** Mixture materialization: target weight of source srcN is (N+1)/210
    * over a 420-doc target corpus, so quota(srcN) = 2*(N+1) docs, capped
    * at the 40-row aggregate bound AND by availability (at the driver
    * scale the high-index sources cap on availability, exercising the
    * branch). The explicit `least(..., 40)` keeps the quota formula and
    * the bounded aggregate in lockstep: without it, a source index >= 20
    * would ask for more rows than BottomKByHash(40) retained and the
    * result would silently diverge from the oracle. Selection within a
    * source is the quota smallest salted hashes; output is the
    * per-source audit (available, quota, actually kept docs/chars,
    * achieved char share).
    *
    * Shape: one scan, one groupBy(source) carrying the bounded
    * [[BottomKByHash]] state (k = max quota), quota arithmetic and the
    * share window on the 20 aggregated rows only. The kept-chars sum
    * folds over the bounded selection array — integer math end-to-end,
    * one double division for the share: oracle-exact. */
  def q75MixtureSample(s: SparkSession, dir: String): DataFrame = {
    val bk = udaf(new BottomKByHash(40))
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.documents(s, dir)
      .select(col("source"), col("doc_id"), col("n_chars"),
        saltedHash("mix-salt-").as("hk"),
        substring(col("source"), 4, 10).cast("long").as("idx"))
      .groupBy(col("source"))
      .agg(max(col("idx")).as("idx"), count(lit(1)).as("n_avail"),
        bk(col("hk"), col("doc_id"), col("n_chars")).as("sel"))
      .withColumn("quota", expr("least((420 * (idx + 1)) div 210, 40L)"))
      .withColumn("kept",
        slice(col("sel"), lit(1), least(col("quota"), size(col("sel")).cast("long")).cast("int")))
      .select(col("source"), col("n_avail"), col("quota"),
        size(col("kept")).cast("long").as("n_kept"),
        aggregate(col("kept"), lit(0L), (acc, x) => acc + x.getField("payload"))
          .as("kept_chars"))
      .withColumn("char_share",
        col("kept_chars").cast("double") / sum(col("kept_chars")).over(w))
      .orderBy(col("source"))
  }

  // ---- oracle SQL ----

  private def sqlHash(salt: String): String =
    TextOps.sqlPolyHash61(s"'$salt' || CAST(doc_id AS VARCHAR)")

  val queries: Map[String, Q] = Map(
    "q74_reservoir" -> (q74ReservoirSample _),
    "q75_mixture" -> (q75MixtureSample _))

  val oracleSql: Map[String, String] = Map(
    "q74_reservoir" ->
      s"""WITH h AS (
         |  SELECT lang, doc_id, ${sqlHash("res-salt-")} AS hk FROM documents),
         |r AS (
         |  SELECT lang, doc_id,
         |    CAST(row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id)
         |      AS BIGINT) AS rk
         |  FROM h)
         |SELECT lang, rk, doc_id FROM r WHERE rk <= 20
         |ORDER BY lang, rk""".stripMargin,
    "q75_mixture" ->
      s"""WITH h AS (
         |  SELECT source, doc_id, n_chars,
         |    CAST(substr(source, 4) AS BIGINT) AS idx,
         |    ${sqlHash("mix-salt-")} AS hk
         |  FROM documents),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY source
         |    ORDER BY hk, doc_id) AS rn FROM h),
         |q AS (
         |  SELECT source, count(*) AS n_avail,
         |    least((420 * (max(idx) + 1)) // 210, 40) AS quota
         |  FROM h GROUP BY source),
         |k AS (
         |  SELECT r.source, count(*) AS n_kept,
         |    CAST(sum(r.n_chars) AS BIGINT) AS kept_chars
         |  FROM r JOIN q ON r.source = q.source WHERE r.rn <= q.quota
         |  GROUP BY r.source)
         |SELECT q.source, q.n_avail, CAST(q.quota AS BIGINT) AS quota,
         |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
         |  CAST(coalesce(k.kept_chars, 0) AS BIGINT) AS kept_chars,
         |  CAST(coalesce(k.kept_chars, 0) AS DOUBLE) /
         |    (SELECT CAST(sum(kept_chars) AS BIGINT) FROM k) AS char_share
         |FROM q LEFT JOIN k ON q.source = k.source
         |ORDER BY q.source""".stripMargin)
}
