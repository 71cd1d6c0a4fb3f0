package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style partitioned parquet store — the batch store side of
  * ingest→process→store when the target is a filesystem/table layout
  * rather than a keyed upsert store ([[graft.streaming.UpsertSink]]).
  *
  * Reference origin: the Kudu DDLs hash-partition every table by its
  * key (e.g. ny_taxi kudu table creation; the impala DDL files) so reads touch
  * only relevant tablets. The Spark-native equivalent for an object
  * store is directory partitioning: `write.partitionBy(cols)` lays out
  * `col=value/` directories, and any read filtered on those columns
  * prunes to the matching directories BEFORE listing files — at 100 TB
  * the difference between scanning a day and scanning the archive.
  *
  * Partition column choice is the scale contract: low-cardinality,
  * coarse (lang, ingest date), never a high-cardinality key — a
  * million tiny directories is its own pathology. Within partitions,
  * `sortWithinPartitions` on the frequent filter key gives parquet
  * min/max row-group pruning a second level of skipping.
  */
object PartitionedStore {

  /** Write `df` as a partitioned parquet store. `sortCols` orders rows
    * within each output file so row-group stats prune point lookups. */
  def write(df: DataFrame, dir: String, partitionCols: Seq[String],
      sortCols: Seq[String] = Nil): Unit = {
    val sorted =
      if (sortCols.isEmpty) df
      else df.sortWithinPartitions(sortCols.map(df.col): _*)
    sorted.write
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(dir)
  }

  /** Read the store back; filters on the partition columns become
    * directory pruning (visible as PartitionFilters in the scan plan). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
