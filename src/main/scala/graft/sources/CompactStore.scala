package graft.sources

import graft.{Engine, Num, QueryPack, Tables}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the table SERVICE of the store family. The
  * other stores fix layout at WRITE time ([[PartitionedStore]]
  * directories, [[BucketedStore]] buckets, [[ZOrderStore]] curve order,
  * [[ManifestStore]] file stats); this one REPAIRS a store whose layout
  * decayed through incremental ingest. Micro-batch ingest (the
  * reference's DStream sinks, our s4/s5 foreachBatch sinks —
  * ny_taxi/NyTaxiYellowTripStreaming.scala:123-129 writes every
  * micro-batch straight to the store) emits one-plus files per trigger;
  * after a week a 100 TB table is millions of KB-sized, unsorted files,
  * and every query pays per-file list/open/footer costs that dwarf the
  * bytes read, with row-group stats too scattered to prune anything.
  * Delta's OPTIMIZE and Iceberg's rewrite_data_files exist exactly for
  * this; `compact` is that service as one Spark job:
  *
  *  1. SIZE the store from the file LISTING (metadata, not data): total
  *     bytes / target file size → output file count. The listing is a
  *     driver loop over FileStatus entries — bounded by file count, the
  *     same cardinality every parquet scan's planner already lists.
  *  2. REWRITE in one range shuffle clustered on the dominant query key
  *     (event time here): `repartitionByRange(n, ts) +
  *     sortWithinPartitions(ts)` yields equal-sized, SORTED files, so
  *     row-group min/max stats become selective again — compaction
  *     restores the assumptions the ZOrder/Manifest tiers build on.
  *  3. SWAP: the rewrite lands in a versioned sibling directory and the
  *     reader pointer moves only after success (a table format commits
  *     this swap in its log; readers of the old version are undisturbed
  *     — here the pointer is the per-JVM cache entry).
  *
  * Results never depend on the layout, so the probe query over the
  * compacted store is oracle-exact against the raw table.
  */
object CompactStore extends QueryPack {

  /** Total bytes and file count of the parquet data files under `path`
    * (driver-side listing — one FileStatus per file, the planner's own
    * cardinality; no data is read). */
  def dataFiles(s: SparkSession, path: String): (Long, Int) = {
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, s.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter(f => f.isFile &&
      f.getPath.getName.endsWith(".parquet"))
    // the listing is non-recursive by design (compaction targets flat
    // stores); pointed at a partitioned/subdirectory layout it would see
    // zero files and silently plan n=1 — fail loudly instead
    require(files.nonEmpty, s"no parquet data files directly under $path " +
      "(partitioned stores are compacted per leaf directory)")
    (files.map(_.getLen).sum, files.length)
  }

  /** Rewrite the store at `fragPath` into `ceil(bytes/targetFileBytes)`
    * time-clustered files at `outPath`. Returns the output file count.
    * One shuffle, size-proportional; the only driver state is the byte
    * total from the listing. */
  def compact(s: SparkSession, fragPath: String, outPath: String,
              targetFileBytes: Long): Int = {
    val (bytes, _) = dataFiles(s, fragPath)
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    s.read.parquet(fragPath)
      .repartitionByRange(n, col("ts_us"))
      .sortWithinPartitions("ts_us")
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    n
  }

  /** Write events as a deliberately FRAGMENTED store: hash-scattered
    * across `files` writers, the layout incremental ingest produces
    * (many small files, no clustering, useless row-group stats). */
  def writeFragmented(ev: DataFrame, path: String, files: Int): Unit =
    ev.repartition(files, col("event_id"))
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Per-JVM pointer: dir → compacted store path (the q28/q76
    * amortization contract — fragment + compact once per JVM per source
    * dir; the POINTER move is the swap step a table format logs). */
  private val built = scala.collection.mutable.Map.empty[String, String]

  def store(s: SparkSession, dir: String): String = synchronized {
    built.getOrElseUpdate(dir, {
      val ev = Tables.eventsTs(s, dir)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("event_type"), col("value"))
      val fragPath = Engine.storePath("graft-compact-frag", dir)
      val outPath = Engine.storePath("graft-compact-v2", dir)
      writeFragmented(ev, fragPath, files = 96)
      // ~4 MB targets at test scale keep the output multi-file so the
      // spec can assert sizing; production targets are 128 MB — 1 GB.
      compact(s, fragPath, outPath, targetFileBytes = 4L << 20)
      outPath
    })
  }

  /** The ops probe over the compacted store: one time decile, per-type
    * rollup. After compaction the literal time predicate prunes whole
    * files (sorted layout → tight row-group stats); the fragmented
    * layout would read every file. Bounds derive from the corpus
    * min/max by integer arithmetic so the oracle reproduces them:
    * oracle-exact. */
  def q95CompactScan(s: SparkSession, dir: String): DataFrame = {
    val path = store(s, dir)
    val st = s.read.parquet(path)
    val r = st.agg(min(col("ts_us")), max(col("ts_us"))).head()
    val (tmn, tmx) = (r.getLong(0), r.getLong(1))
    val (tlo, thi) = (tmn + (tmx - tmn + 1) * 3 / 10, tmn + (tmx - tmn + 1) * 4 / 10)
    st.filter(col("ts_us") >= tlo && col("ts_us") < thi)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        Num.moneySum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, Q] = Map(
    "q95_compact_scan" -> (q95CompactScan _))

  val oracleSql: Map[String, String] = Map(
    "q95_compact_scan" ->
      s"""WITH e AS (
         |  SELECT epoch_us(ts) AS ts_us, event_type, user_id, value
         |  FROM events),
         |mm AS (SELECT min(ts_us) AS tmn, max(ts_us) AS tmx FROM e),
         |b AS (
         |  SELECT tmn + ((tmx - tmn + 1) * 3) // 10 AS tlo,
         |    tmn + ((tmx - tmn + 1) * 4) // 10 AS thi FROM mm)
         |SELECT event_type, count(*) AS n_events,
         |  count(DISTINCT user_id) AS n_users,
         |  ${Num.sql.moneySum("value")} AS sum_value
         |FROM e, b WHERE ts_us >= tlo AND ts_us < thi
         |GROUP BY event_type ORDER BY event_type""".stripMargin)
}
