package graft.sources

import graft.{Engine, Num, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DECLARATIVE MERGE for the versioned store (round-16 verdict "what's
  * missing" #1) — the Delta-class `MERGE INTO store USING source ON
  * store.key = source.key WHEN MATCHED ... WHEN NOT MATCHED ...` verb,
  * compiled onto the existing copy-on-write keyed-commit machinery
  * ([[graft.streaming.UpsertSink.upsertBatch]]'s classify path):
  *
  *  - WHEN MATCHED `update`  — the source row REPLACES the store row
  *    (whole-row SET *, the Kudu newUpdate semantics);
  *  - WHEN MATCHED `delete`  — the store row is removed (the COW
  *    delete riding the SAME single rewrite, not a second commit);
  *  - WHEN NOT MATCHED `insert` — the source row lands as new;
  *  - `ignore` on either side no-ops that branch;
  *  - `matchedCond` (optional Spark SQL boolean over the SOURCE row)
  *    narrows the matched action — matched rows failing it keep their
  *    store row untouched (the `WHEN MATCHED AND cond` form).
  *
  * ONE atomic commit: matched/unmatched classification reads only the
  * band+bloom-TOUCHED files ([[graft.streaming.UpsertSink.readTouched]]
  * minus the tip's deletion vector), the rewrite touches exactly the
  * owning files, everything else carries forward by reference, and the
  * claimed-slot settle discipline makes a racing writer force a replan,
  * never a lost update. Cost ∝ source batch + touched files — never
  * the store.
  *
  * Reference anchor: `impala/ny_taxi/update_ny_taxi_yellow_entity.impala`
  * (an UPDATE statement against the entity store) and the insert-vs-
  * update split in `KuduDStreamFunctions.scala` — the reference's
  * operational path IS keyed merge; this gives it the declarative SQL
  * verb (`CALL graft_store_merge`).
  */
object StoreMerge extends QueryPack {

  private def empty(like: DataFrame): DataFrame = like.filter(lit(false))

  /** Execute the merge; returns the committed version, or None when the
    * statement changed nothing (both branches no-op'd — no version is
    * committed, the Delta empty-merge rule) or `batchId` was already
    * committed (replay). Source keys must be unique — the SQL MERGE
    * cardinality rule (a source matching one target row twice is an
    * error, not last-writer-wins). */
  def merge(s: SparkSession, path: String, source: DataFrame,
      keyCol: String,
      whenMatched: String, whenNotMatched: String,
      matchedCond: Option[String] = None,
      batchId: Long = System.nanoTime()): Option[Int] = {
    require(Seq("update", "delete", "ignore").contains(whenMatched),
      s"whenMatched must be update|delete|ignore, got '$whenMatched'")
    require(Seq("insert", "ignore").contains(whenNotMatched),
      s"whenNotMatched must be insert|ignore, got '$whenNotMatched'")
    require(whenMatched != "ignore" || whenNotMatched != "ignore",
      "merge with both branches 'ignore' is a no-op statement")
    VersionedStore.requireSupportedKey(source, keyCol)
    // the SQL MERGE cardinality check: one source row per key (batch-
    // sized aggregate, paid once)
    require(source.groupBy(col(keyCol)).count()
      .filter(col("count") > 1).limit(1).isEmpty,
      s"merge source has duplicate '$keyCol' keys — SQL MERGE forbids " +
        "a target row matched by more than one source row")
    // matched = source keys present in the CURRENT tip (touched files
    // only, minus the deletion vector in force — a dv-erased key is
    // logically absent and re-inserts)
    val tipKeys = graft.streaming.UpsertSink
      .readTouched(s, path, source.select(col(keyCol)), keyCol)
      .map { t =>
        val tip = VersionedStore.versions(s, path).max
        VersionedStore.dvAt(s, path, tip)
          .fold(t)(dv => t.join(broadcast(dv), Seq(keyCol), "left_anti"))
          .select(col(keyCol)).distinct()
      }
    val srcMAll = tipKeys.map(k => source.join(k, Seq(keyCol), "left_semi"))
      .getOrElse(empty(source))
    val srcU = tipKeys.map(k => source.join(k, Seq(keyCol), "left_anti"))
      .getOrElse(source)
    val srcM = matchedCond.map(c => srcMAll.filter(expr(c))).getOrElse(srcMAll)
    val replace =
      (if (whenMatched == "update") srcM else empty(source))
        .unionByName(if (whenNotMatched == "insert") srcU else empty(source))
    val drops =
      if (whenMatched == "delete") Some(srcM.select(col(keyCol))) else None
    graft.streaming.UpsertSink.upsertBatch(replace, path, batchId, keyCol,
      initialPartitions = 1, settleTimeoutMs = 30000L,
      dropKeys = drops, operation = "merge")
  }

  // ---------------------------------------------------------------
  // gated harness (q133): a two-statement merge lineage on real orders
  // ---------------------------------------------------------------

  private val cut2 = "1998-01-01"
  private val built = scala.collection.mutable.Map.empty[String, String]

  private[graft] def mergeStore(s: SparkSession, dir: String): String =
    synchronized {
      built.getOrElseUpdate(dir, {
        val path = Engine.storePath("graft-versioned-merge", dir)
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p) && VersionedStore.versions(s, path) != Seq(1, 2, 3))
          fs.delete(p, true)
        if (VersionedStore.versions(s, path).isEmpty) {
          val o = Tables.orders(s, dir).select(col("o_orderkey"),
            col("o_custkey"), col("o_orderstatus"), col("o_orderdate"),
            Num.cents(col("o_totalprice")).as("amount_c"))
          // v1: the pre-1998 book
          VersionedStore.appendCommit(s, path,
            o.filter(col("o_orderdate") < to_timestamp(lit(cut2)))
              .drop("o_orderdate"), "o_orderkey", 4)
          // v2: MERGE a correction feed — every %3 key at doubled cents;
          // in-book keys update, out-of-book keys insert
          merge(s, path,
            o.filter(col("o_orderkey") % 3 === 0).drop("o_orderdate")
              .withColumn("amount_c", col("amount_c") * 2),
            "o_orderkey", whenMatched = "update", whenNotMatched = "insert",
            batchId = 1001L)
          // v3: MERGE an erasure feed — %5 keys leave the book where
          // matched; unmatched keys no-op (WHEN NOT MATCHED ignored)
          merge(s, path,
            o.filter(col("o_orderkey") % 5 === 0).drop("o_orderdate"),
            "o_orderkey", whenMatched = "delete", whenNotMatched = "ignore",
            batchId = 1002L)
        }
        path
      })
    }

  /** q133: the post-merge tip per order status — update, insert and
    * delete actions all land in the summary, so a matched key kept at
    * its old amount, an unmatched insert lost, a delete leaking through
    * or a double-applied update breaks a count or an integer-cent sum
    * against the oracle's restatement of the two statements. */
  def q133Merge(s: SparkSession, dir: String): DataFrame = {
    val path = mergeStore(s, dir)
    VersionedStore.readVersion(s, path, 3)
      .groupBy(col("o_orderstatus").as("grp"))
      .agg(count(lit(1)).as("n_rows"), sum(col("amount_c")).as("amount_c"),
        count_distinct(col("o_custkey")).as("n_customers"))
      .orderBy(col("grp"))
  }

  val queries: Map[String, Q] = Map("q133_merge" -> (q133Merge _))

  val oracleSql: Map[String, String] = Map(
    "q133_merge" ->
      s"""WITH o AS (
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_orderdate,
         |    ${Num.sql.cents("o_totalprice")} AS a
         |  FROM orders),
         |v2 AS (
         |  SELECT o_orderkey, o_custkey, o_orderstatus, a FROM o
         |  WHERE o_orderdate < TIMESTAMP '$cut2' AND o_orderkey % 3 <> 0
         |  UNION ALL
         |  SELECT o_orderkey, o_custkey, o_orderstatus, 2 * a FROM o
         |  WHERE o_orderkey % 3 = 0),
         |v3 AS (SELECT * FROM v2 WHERE o_orderkey % 5 <> 0)
         |SELECT o_orderstatus AS grp, count(*) AS n_rows,
         |  CAST(sum(a) AS BIGINT) AS amount_c,
         |  count(DISTINCT o_custkey) AS n_customers
         |FROM v3 GROUP BY 1 ORDER BY 1""".stripMargin)
}
