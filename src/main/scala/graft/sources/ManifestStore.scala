package graft.sources

import graft.{Engine, Num, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-statistics manifest — the middle tier of the store family's
  * pruning ladder: [[PartitionedStore]] prunes DIRECTORIES on partition
  * values, this prunes FILES on collected min/max column stats, and
  * [[ZOrderStore]] prunes ROW GROUPS inside the files that survive.
  *
  * This is the table-format trick (Delta/Iceberg keep exactly such
  * per-file stats in their transaction log): plain parquet makes the
  * planner list and open every file, with skipping only at row-group
  * level inside each. A manifest — one row per file with min/max of the
  * clustered key, built by one scan over `input_file_name()` — lets the
  * planner select the overlapping file subset FIRST, so files that
  * cannot match are never opened. The matching file list is
  * driver-held, like any file listing: bounded by file count, not data
  * (a 100 TB store at 1 GB/file is a 10^5-row manifest).
  *
  * The layout invests one range shuffle at build time (files = key
  * ranges); the manifest is rebuilt by one cheap aggregate whenever the
  * store changes — the same contract as the other stores' amortized
  * builds. Results never depend on the manifest (it only narrows which
  * files are READ), so the probe query stays oracle-exact.
  */
object ManifestStore extends QueryPack {

  /** Write `ev` clustered by user_id into `files` range files and build
    * the per-file (min, max) manifest in one pass over the store. */
  def build(ev: DataFrame, path: String, files: Int): Array[(String, Long, Long)] = {
    ev.repartitionByRange(files, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode(SaveMode.Overwrite).parquet(path)
    ev.sparkSession.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min("user_id").as("mn"), max("user_id").as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
  }

  /** Per-JVM store cache: dir → (path, manifest) — q28/q76 amortization
    * contract, per source dir. */
  private val built =
    scala.collection.mutable.Map.empty[String, (String, Array[(String, Long, Long)])]

  def store(s: SparkSession, dir: String): (String, Array[(String, Long, Long)]) =
    synchronized {
      built.getOrElseUpdate(dir, {
        val ev = Tables.eventsTs(s, dir)
          .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
        val path = Engine.storePath("graft-manifest-store", dir)
        (path, build(ev, path, files = 64))
      })
    }

  /** Select the manifest files overlapping [lo, hi] — the planner step a
    * table format runs from its stats log. */
  def filesFor(manifest: Array[(String, Long, Long)], lo: Long, hi: Long): Array[String] =
    manifest.collect { case (f, mn, mx) if mx >= lo && mn <= hi => f }

  /** Cohort rollup planned through the manifest: only files whose
    * [min, max] overlaps the user range are opened at all; the exact
    * predicate still applies inside them. The spec asserts the scan's
    * numFiles is the manifest subset, not the store's file count; the
    * result equals the plain full-store filter (oracle-exact). */
  def q82ManifestScan(s: SparkSession, dir: String): DataFrame = {
    val (path, manifest) = store(s, dir)
    val (umn, umx) = (manifest.map(_._2).min, manifest.map(_._3).max)
    val (lo, hi) = (umn + (umx - umn + 1) * 3 / 10, umn + (umx - umn + 1) * 6 / 10)
    val selected = filesFor(manifest, lo, hi)
    require(selected.nonEmpty, s"manifest selected no files for [$lo, $hi]")
    s.read.parquet(selected: _*)
      .filter(col("user_id") >= lo && col("user_id") <= hi)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        Num.moneySum(col("value")).as("sum_value"))
      .orderBy(col("user_id"))
  }

  val queries: Map[String, Q] = Map(
    "q82_manifest_scan" -> (q82ManifestScan _))

  val oracleSql: Map[String, String] = Map(
    "q82_manifest_scan" ->
      s"""WITH e AS (
         |  SELECT user_id, value FROM events),
         |mm AS (
         |  SELECT min(user_id) AS umn, max(user_id) AS umx FROM e),
         |b AS (
         |  SELECT umn + ((umx - umn + 1) * 3) // 10 AS lo,
         |    umn + ((umx - umn + 1) * 6) // 10 AS hi FROM mm)
         |SELECT user_id, count(*) AS n_events,
         |  ${Num.sql.moneySum("value")} AS sum_value
         |FROM e, b WHERE user_id >= lo AND user_id <= hi
         |GROUP BY user_id ORDER BY user_id""".stripMargin)
}
