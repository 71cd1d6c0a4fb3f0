package graft.sources

import graft.{Engine, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted approximate-kNN graph — the last per-JVM ANN structure
  * made store-resident (round 10 persisted the LSH code tables, IVF
  * cells and quantized codes; the GRAPH the centrality walk consumes
  * was still a FrameCache entry rebuilt from the full LSH candidate
  * pipeline in every fresh process). The store holds exactly what the
  * walk needs — the symmetrized bounded top-3 edge relation
  * (src, dst) WITH each node's true out-degree attached (the
  * variable-degree division q96b's integer PageRank requires, counted
  * once at build) — src-range clustered into a DATA-SIZED file count
  * (the CompactStore ceil(bytes/target) rule: a billion-edge graph
  * lands in proportionally many files, a small one in a few), with a
  * per-file (min, max) src manifest so any per-node graph read opens
  * only the file subset whose range holds the node.
  *
  * q96c runs the IDENTICAL damped integer-ppt PageRank walk as q96b
  * over the persisted edges: same longs in, floor divisions and long
  * sums all the way down, so the trajectory — and the top-50 — is
  * BIT-IDENTICAL to q96b's (spec-asserted). What the store buys is the
  * serving economics: a fresh JVM pays one bounded edge-relation scan
  * per walk instead of re-running digest canonicalization, the banded
  * bucket join, exact rescoring and the top-3 tail — the q86b/q51b
  * amortization, applied to the graph tier.
  */
object KnnGraphStore extends QueryPack {

  def manifestPath(storePath: String): String = storePath + ".manifest"

  /** Estimated on-disk bytes per (src, dst, deg) edge row — three
    * int64 columns plus parquet structure; the sizing input when the
    * edge count is known before the write (counting bytes would need
    * the CompactStore double-write). */
  private val BytesPerEdge = 32L

  /** Build: the q73b LSH kNN graph, degrees attached, src-clustered
    * into `ceil(edges · BytesPerEdge / targetFileBytes)` range files
    * (sized from the DATA like every store in the family — never a
    * hardcoded file count), plus the per-file src-range manifest that
    * makes per-node reads open a file subset. The edge frame persists
    * across its count and write so the LSH candidate pipeline runs
    * once. */
  def build(s: SparkSession, dir: String, path: String,
      targetFileBytes: Long): Unit = {
    val e = graft.operators.Similarity.q73bKnnGraphLsh(s, dir)
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
    val edges = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = math.max(1L,
        (edges.count() * BytesPerEdge + targetFileBytes - 1) / targetFileBytes)
        .toInt
      edges.repartitionByRange(n, col("src"))
        .sortWithinPartitions("src", "dst")
        .write.mode(SaveMode.Overwrite).parquet(path)
    } finally edges.unpersist(false)
    AnnIndexStore.writeKeyManifest(s, path, "src", manifestPath(path))
  }

  private val built = scala.collection.mutable.Map.empty[String, String]

  /** Per-JVM store cache. The gated build targets 16 KiB files — the
    * CompactStoreSpec-style small target that yields a multi-file,
    * manifest-prunable layout at test scale; a production build passes
    * the lake's real target (e.g. 128 MiB). */
  def store(s: SparkSession, dir: String): String = synchronized {
    built.getOrElseUpdate(dir, {
      val path = Engine.storePath("graft-knn-graph", dir)
      build(s, dir, path, targetFileBytes = 16L << 10)
      path
    })
  }

  /** Per-node graph read: `src`'s adjacency rows through the manifest —
    * opens ONLY the file subset whose src range holds the node (the
    * q99 point-lookup pattern on the edge relation; the pruning thesis
    * is spec-asserted in KnnGraphStoreSpec). */
  def neighbors(s: SparkSession, path: String, src: Long): DataFrame = {
    val files = AnnIndexStore.filesForKeysIn(s, Seq(manifestPath(path)), Seq(src))
    require(files.nonEmpty, s"node $src not covered by any store file")
    s.read.parquet(files: _*).filter(col("src") === src)
  }

  /** q96c: graph centrality served from the persisted edge relation —
    * q96b's walk with the edge build amortized into the store. */
  def q96cKnnCentralityIndex(s: SparkSession, dir: String): DataFrame = {
    val edges = s.read.parquet(store(s, dir))
    val vertices = Tables.embeddings(s, dir).select(col("vec_id"))
    graft.operators.Similarity.centralityFromEdges(vertices, edges)
  }

  val queries: Map[String, Q] = Map(
    "q96c_knn_centrality_index" -> (q96cKnnCentralityIndex _))

  // rows-only: the edge set is LSH-built (the q96b precedent); the
  // bit-identity with q96b is spec-asserted in KnnGraphStoreSpec.
  val oracleSql: Map[String, String] = Map.empty
}
