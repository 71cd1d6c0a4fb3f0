package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  private val packs: Seq[QueryPack] = Seq(
    operators.Relational, operators.Ingest, operators.Entity,
    operators.Text, operators.Bpe, operators.Dedup, operators.Similarity,
    operators.MlStats, operators.Binary, operators.Jpeg, operators.Sampling,
    operators.Audit,
    sources.BucketedStore, sources.ZOrderStore, sources.ManifestStore,
    sources.CompactStore, sources.InvertedIndexStore, sources.KeyedStore,
    sources.VersionedStore, sources.StoreLineage, sources.Expectations,
    sources.StoreMerge,
    sources.ChangeFeed, sources.ColStats,
    sources.AnnIndexStore, sources.Scd2Store, sources.KnnGraphStore)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1RollupMeasures(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap
}
