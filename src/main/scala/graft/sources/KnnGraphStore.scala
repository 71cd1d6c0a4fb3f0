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
  * once at build) — src-range clustered, so any per-node graph read
  * prunes by file.
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

  /** Build: the q73b LSH kNN graph, degrees attached, src-clustered. */
  def build(s: SparkSession, dir: String, path: String): Unit = {
    val e = graft.operators.Similarity.q73bKnnGraphLsh(s, dir)
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
    e.join(e.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
      .repartitionByRange(8, col("src"))
      .sortWithinPartitions("src", "dst")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  private val built = scala.collection.mutable.Map.empty[String, String]

  def store(s: SparkSession, dir: String): String = synchronized {
    built.getOrElseUpdate(dir, {
      val path = Engine.storePath("graft-knn-graph", dir)
      build(s, dir, path)
      path
    })
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
