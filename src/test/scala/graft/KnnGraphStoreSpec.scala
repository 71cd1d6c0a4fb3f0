package graft

import graft.sources.KnnGraphStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted graph must serve the SAME centrality bits as the
  * in-memory tier: the walk is exact integer arithmetic over the edge
  * longs, so a correct store roundtrip is bit-invisible. */
class KnnGraphStoreSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.01"

  test("q96c serves bit-identically to q96b from the persisted edges") {
    val fromStore = KnnGraphStore.q96cKnnCentralityIndex(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val inMemory = operators.Similarity.q96bKnnCentralityLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(fromStore.nonEmpty, "store walk returned nothing — vacuous")
    assert(fromStore == inMemory,
      s"persisted-graph centrality diverged:\n  store=$fromStore\n  mem=$inMemory")
    // the store really holds degrees (the variable-degree division's
    // input), and they are each node's true edge fan-out
    val e = spark.read.parquet(KnnGraphStore.store(spark, sf))
    val bad = e.groupBy(col("src"), col("deg"))
      .agg(count(lit(1)).as("c"))
      .filter(col("deg") =!= col("c")).count()
    assert(bad == 0, s"$bad nodes carry a degree != their edge count")
  }
}
