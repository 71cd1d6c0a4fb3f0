package graft

import graft.sources.{IndexTombstones, InvertedIndexStore, VersionedStore}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Serving-store ERASURE scale smoke (round-15 verdict #1's "Done"
  * clause): drive the inverted index's purge verb at a 1x and an Rx
  * (default 16x) corpus and measure the walls the design pins:
  *
  *  - **purge ∝ batch**: a FIXED 50-doc purge resolves its doc lengths
  *    through the doclens manifest (point read of the owning files) and
  *    appends O(keys) tombstones — ~the same wall at 16x the corpus;
  *  - **probe flat**: the tombstone-aware BM25 probe stays the q86b
  *    manifest-pruned read (the established flat serving thesis), the
  *    anti-join riding it;
  *  - **fold ∝ admitted files**: a 1-doc fold rewrites only the files
  *    whose doc_id bloom admits the id — the report carries
  *    (rewritten, total) so the ratio is visible at both scales.
  *
  * Harness main, not a gated query. One JSON line per scale point.
  * `sbt "runMain graft.IndexPurgeScaleSmoke [replicas]"` (default 16).
  */
object IndexPurgeScaleSmoke {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = Engine.session(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")

    val src = "/root/testdata/sf0.1"
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    Seq(1, replicas).foreach { rep =>
      val base = s"/tmp/graft_ipsmoke_${rep}x"
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val reps = spark.range(rep).select(col("id").as("rep"))
      val docs = spark.read.parquet(s"$src/documents.parquet")
        .crossJoin(reps)
        .withColumn("doc_id", col("doc_id") + col("rep") * 10000000L)
        .drop("rep")
      val path = s"$base/ix"
      // file count grows with the corpus (the stream-of-appends layout)
      val (_, buildS) = time {
        InvertedIndexStore.build(docs, path, files = 16 * rep)
      }
      val nDocs = docs.count()

      // FIXED 50-doc purge, real ids spread over the whole corpus
      // (sampled before the timed region)
      val purgeIds = docs.select(col("doc_id"))
        .filter(col("doc_id") % 101 === 7)
        .orderBy(xxhash64(col("doc_id"))).limit(50)
        .collect().map(_.getLong(0)).toSeq
      val (_, purgeS) = time {
        InvertedIndexStore.purge(spark, path, purgeIds)
      }
      val tombs = IndexTombstones.keySet(spark, path).size

      // the tombstone-aware probe (the q86b shape + anti-join)
      val (probeN, probeS) = time {
        InvertedIndexStore.bm25Probe(spark, path).count()
      }

      // fold cost ∝ bloom-admitted files: make the 50-key erasure
      // physical first (untimed — scattered keys admit most files by
      // design), then time a ONE-key fold: the blooms must keep its
      // rewrite set at the handful of files actually holding the doc
      InvertedIndexStore.fold(spark, path)
      val one = docs.select(col("doc_id"))
        .filter(col("doc_id") % 103 === 11)
        .orderBy(xxhash64(col("doc_id"))).limit(1)
        .collect().map(_.getLong(0)).toSeq
      InvertedIndexStore.purge(spark, path, one)
      val totalFiles =
        VersionedStore.hadoopLs(spark, path).size +
        VersionedStore.hadoopLs(spark, InvertedIndexStore.posPath(path)).size +
        VersionedStore.hadoopLs(spark,
          InvertedIndexStore.doclensPath(path)).size
      val (folded, foldS) = time {
        InvertedIndexStore.fold(spark, path)
      }

      println(f"""{"smoke":"index_purge_scale","rep":$rep,"docs":$nDocs,""" +
        f""""build_s":$buildS%.3f,"purge_keys":${purgeIds.size},""" +
        f""""tombstoned":$tombs,"purge_s":$purgeS%.3f,""" +
        f""""probe_rows":$probeN,"probe_s":$probeS%.3f,""" +
        f""""fold_rewritten":$folded,"fold_total_files":$totalFiles,""" +
        f""""fold_s":$foldS%.3f}""")
      // leave nothing behind in /tmp
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
    }
    spark.stop()
  }
}
