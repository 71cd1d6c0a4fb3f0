package graft.sources

import graft.{Engine, Num, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** WRITE-PATH EXPECTATIONS for the versioned store — the data-quality
  * gate a training-data pipeline needs AT INGEST, not as an
  * after-the-fact audit (q101 reports violations in data already
  * committed; this keeps them from committing at all):
  *
  *   - [[declare]] stores named CHECK predicates (ordinary Spark SQL
  *     boolean expressions over the batch's columns) in a tiny
  *     relation beside the store — declared once, enforced on every
  *     [[guardedAppend]];
  *   - [[guardedAppend]] splits each batch in ONE predicate pass:
  *     rows passing every expectation commit exactly like
  *     [[VersionedStore.appendCommit]]; violating rows land in the
  *     version's QUARANTINE relation labelled with the FIRST failing
  *     expectation (declaration order — deterministic triage), written
  *     inside the claimed slot BEFORE the commit marker, so the data
  *     and its rejects commit atomically or not at all;
  *   - [[quarantine]] reads the rejects of any committed version (and
  *     [[quarantineThrough]] the lineage's union) — the retraining
  *     loop's "what did we drop and why" relation.
  *
  * The Delta-Live-Tables expectations idea re-expressed on the store's
  * own commit protocol. Scale shape: the split is two scans of the
  * incoming BATCH (delta-sized, never store-sized), the predicate
  * column is pure Catalyst (codegen, no UDF), and quarantine files are
  * delta-sized. Ref: the reference ingests unvalidated
  * (`NyTaxiYellowTripStreaming.scala` parses and stores every row);
  * validation-at-ingest is what the same pipe needs at 100 TB, where a
  * bad upstream day poisons a thousand downstream jobs.
  */
object Expectations extends QueryPack {

  def rulesPath(path: String): String = path + "/_expectations"
  def quarantineDir(path: String): String = path + "/quarantine"
  def quarantinePath(path: String, v: Int): String =
    quarantineDir(path) + s"/v$v"

  /** Declare (replace) the store's expectations: ordered (name,
    * predicate) pairs; predicates are Spark SQL boolean expressions
    * over the batch columns. Order matters — a row violating several
    * rules is labelled with the FIRST. */
  def declare(s: SparkSession, path: String,
      rules: Seq[(String, String)]): Unit = {
    require(rules.map(_._1).distinct.size == rules.size,
      s"duplicate expectation names in ${rules.map(_._1)}")
    import s.implicits._
    rules.zipWithIndex.map { case ((n, p), i) => (i, n, p) }
      .toDF("ord", "name", "predicate")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(rulesPath(path))
  }

  /** The declared expectations in declaration order (empty when the
    * store has none — one existence probe). */
  def declared(s: SparkSession, path: String): Seq[(String, String)] = {
    val p = new org.apache.hadoop.fs.Path(rulesPath(path))
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else s.read.parquet(rulesPath(path)).orderBy(col("ord"))
      .select(col("name"), col("predicate"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
  }

  /** The first-failing-expectation column: NULL = row passes all.
    * A predicate evaluating to NULL (e.g. `acct_c >= 0` over a NULL
    * balance) counts as a VIOLATION — the DLT expect_or_drop rule
    * (non-TRUE fails), not SQL-CHECK's unknown-passes: a quality gate
    * that silently commits rows its predicate cannot even evaluate
    * is the round-16 advice's exact finding. */
  private def violatedCol(rules: Seq[(String, String)])
      : org.apache.spark.sql.Column =
    rules.foldLeft(lit(null).cast("string")) { case (acc, (n, p)) =>
      coalesce(acc, when(not(coalesce(expr(p), lit(false))), lit(n)))
    }

  /** One-evaluation split (round-16 advice): the passed/failed halves
    * are TWO actions over the tagged frame, so a non-deterministic
    * source (rand()-derived columns, a table mutated between scans)
    * could lose or duplicate rows across the store/quarantine split.
    * Persisting the tagged frame (memory-and-disk, spill-safe) pins one
    * materialization for both sides; callers unpersist after commit. */
  private def pinTagged(batch: DataFrame,
      rules: Seq[(String, String)]): DataFrame = {
    val tagged = batch.withColumn("_violated", violatedCol(rules))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tagged.count() // materialize eagerly: both splits read this copy
    tagged
  }

  /** Append `batch` under the store's expectations: passing rows
    * commit, violating rows quarantine — atomically, in one version.
    * Returns the committed version. A store with no declared
    * expectations appends plainly (zero overhead). */
  def guardedAppend(s: SparkSession, path: String, batch: DataFrame,
      clusterCol: String, parts: Int): Int = {
    val rules = declared(s, path)
    if (rules.isEmpty)
      return VersionedStore.appendCommit(s, path, batch, clusterCol, parts)
    val tagged = pinTagged(batch, rules)
    try {
      val passed = tagged.filter(col("_violated").isNull).drop("_violated")
      val failed = tagged.filter(col("_violated").isNotNull)
        .withColumnRenamed("_violated", "violated")
      VersionedStore.appendCommit(s, path, passed, clusterCol, parts,
        beforeMarker = v => failed.write.mode(SaveMode.Overwrite)
          .parquet(quarantinePath(path, v)))
    } finally tagged.unpersist()
  }

  /** The rows version `v`'s commit rejected (with their `violated`
    * label). Committed-gated: a crashed writer's orphan quarantine at
    * an uncommitted slot is never served (vacuum reclaims it with the
    * slot). Empty frame when the commit quarantined nothing or
    * pre-dates the expectations. */
  def quarantine(s: SparkSession, path: String, v: Int): DataFrame = {
    require(VersionedStore.versions(s, path).contains(v),
      s"v$v is not a committed version of $path")
    val p = new org.apache.hadoop.fs.Path(quarantinePath(path, v))
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) s.read.parquet(quarantinePath(path, v))
    else VersionedStore.schemaCarrier(s, path, v)
      .withColumn("violated", lit(null).cast("string")).limit(0)
  }

  /** Every committed version's rejects up to and including `v`. */
  def quarantineThrough(s: SparkSession, path: String, v: Int): DataFrame =
    VersionedStore.versions(s, path).filter(_ <= v)
      .map(quarantine(s, path, _)).reduce(_.unionByName(_))

  // ---------------------------------------------------------------
  // STREAMING tier (s23): expectations on the keyed upsert path
  // ---------------------------------------------------------------

  def quarantineBatchPath(path: String, batchId: Long): String =
    quarantineDir(path) + s"/batch_$batchId"

  /** [[graft.streaming.UpsertSink.upsertBatch]] under the store's
    * expectations — the streaming tier of [[guardedAppend]]: each
    * micro-batch splits in the same single predicate pass; rejects land
    * in the BATCH's own quarantine directory (Overwrite — the s15
    * changelog discipline: a checkpoint replay regenerates the same
    * relation rather than duplicating it, and the store commit itself
    * is skipped by the batch-id replay check), written BEFORE the
    * upsert so an all-reject batch still records WHY nothing landed.
    * Per-trigger cost ∝ the batch, never the store. */
  def guardedUpsertBatch(batch: DataFrame, path: String, batchId: Long,
      keyCol: String, initialPartitions: Int = 1): Option[Int] = {
    val s = batch.sparkSession
    val rules = declared(s, path)
    if (rules.isEmpty)
      return graft.streaming.UpsertSink.upsertBatch(
        batch, path, batchId, keyCol, initialPartitions)
    val tagged = pinTagged(batch, rules)
    try {
      tagged.filter(col("_violated").isNotNull)
        .withColumnRenamed("_violated", "violated")
        .write.mode(SaveMode.Overwrite)
        .parquet(quarantineBatchPath(path, batchId))
      graft.streaming.UpsertSink.upsertBatch(
        tagged.filter(col("_violated").isNull).drop("_violated"),
        path, batchId, keyCol, initialPartitions)
    } finally tagged.unpersist()
  }

  /** All streamed batches' rejects, with their batch id. Empty frame
    * (schema-carried) when no batch quarantined anything yet. */
  def quarantineBatches(s: SparkSession, path: String): DataFrame = {
    val qd = new org.apache.hadoop.fs.Path(quarantineDir(path))
    val fs = qd.getFileSystem(s.sparkContext.hadoopConfiguration)
    val dirs =
      if (!fs.exists(qd)) Seq.empty[String]
      else fs.listStatus(qd).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch_"))
        .map(_.getPath.toString)
    if (dirs.isEmpty) {
      val vs = VersionedStore.versions(s, path)
      require(vs.nonEmpty, s"no committed versions and no batch " +
        s"quarantine under $path")
      VersionedStore.schemaCarrier(s, path, vs.last)
        .withColumn("violated", lit(null).cast("string"))
        .withColumn("batch_id", lit(null).cast("long")).limit(0)
    } else
      s.read.parquet(dirs: _*)
        .withColumn("batch_id", regexp_extract(input_file_name(),
          "/batch_(\\d+)/", 1).cast("long"))
  }

  /** Retention for the streamed quarantine (the data-quality relation
    * outlives no audit window forever): keep the newest `keepBatches`
    * batch directories, delete the rest. Returns the reclaimed count.
    * Explicit — store vacuum governs VERSION quarantine (it rides the
    * version lifecycle); batch quarantine has its own horizon because
    * an all-reject batch commits no version to expire with. */
  def vacuumBatchQuarantine(s: SparkSession, path: String,
      keepBatches: Int): Int = {
    require(keepBatches >= 0, "keepBatches must be non-negative")
    val qd = new org.apache.hadoop.fs.Path(quarantineDir(path))
    val fs = qd.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(qd)) return 0
    val batches = fs.listStatus(qd).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch_"))
      .flatMap(st => st.getPath.getName.stripPrefix("batch_").toLongOption
        .map(_ -> st.getPath))
      .sortBy(_._1)
    val drop = batches.dropRight(keepBatches)
    drop.foreach { case (_, p) => fs.delete(p, true) }
    drop.size
  }

  // ---------------------------------------------------------------
  // gated harness: a customer store guarded by a REAL-data rule —
  // TPC-H account balances go negative, so `acct_nonneg` quarantines
  // a genuine slice while `has_segment` passes everything.
  // ---------------------------------------------------------------

  private val guardBuilt = scala.collection.mutable.Map.empty[String, String]

  private[graft] def guardStore(s: SparkSession, dir: String): String =
    synchronized {
      guardBuilt.getOrElseUpdate(dir, {
        val path = Engine.storePath("graft-versioned-guard", dir)
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p) && VersionedStore.versions(s, path) != Seq(1))
          fs.delete(p, true)
        if (VersionedStore.versions(s, path).isEmpty) {
          declare(s, path, Seq(
            ("acct_nonneg", "acct_c >= 0"),
            ("has_segment", "c_mktsegment IS NOT NULL")))
          guardedAppend(s, path,
            Tables.customer(s, dir).select(col("c_custkey"), col("c_name"),
              col("c_mktsegment"), Num.cents(col("c_acctbal")).as("acct_c")),
            "c_custkey", 4)
        }
        path
      })
    }

  /** q131: WRITE-PATH EXPECTATIONS — the committed tip (per segment)
    * beside the quarantine (per violated rule). The oracle restates the
    * predicate split over raw customer, so a violating row leaking into
    * the store, a passing row lost to quarantine, or a wrong
    * first-failing label breaks a count or an integer-cent sum. */
  def q131Expectations(s: SparkSession, dir: String): DataFrame = {
    val path = guardStore(s, dir)
    val stored = VersionedStore.readVersion(s, path, 1)
      .groupBy(col("c_mktsegment").as("grp"))
      .agg(count(lit(1)).as("n_rows"), sum(col("acct_c")).as("acct_c"))
      .select(lit("stored").as("bucket"), col("grp"), col("n_rows"),
        col("acct_c"))
    val rejects = quarantine(s, path, 1)
      .groupBy(col("violated").as("grp"))
      .agg(count(lit(1)).as("n_rows"), sum(col("acct_c")).as("acct_c"))
      .select(lit("quarantined").as("bucket"), col("grp"), col("n_rows"),
        col("acct_c"))
    stored.unionAll(rejects).orderBy(col("bucket"), col("grp"))
  }

  val queries: Map[String, Q] = Map(
    "q131_expectations" -> (q131Expectations _))

  val oracleSql: Map[String, String] = Map(
    "q131_expectations" ->
      s"""WITH c AS (
         |  SELECT c_mktsegment, ${Num.sql.cents("c_acctbal")} AS a
         |  FROM customer)
         |SELECT 'quarantined' AS bucket, 'acct_nonneg' AS grp,
         |  count(*) AS n_rows, CAST(sum(a) AS BIGINT) AS acct_c
         |FROM c WHERE a < 0
         |UNION ALL
         |SELECT 'stored', c_mktsegment, count(*), CAST(sum(a) AS BIGINT)
         |FROM c WHERE a >= 0 GROUP BY c_mktsegment
         |ORDER BY bucket, grp""".stripMargin)
}
