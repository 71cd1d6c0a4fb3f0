package graft.ml

import graft.functions.NearestCentroid
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lloyd's algorithm over a `(vec_id, e: array<double>)` DataFrame,
  * Spark-first: centroids are driver-held k x dim state (k rows — the
  * legitimate "small side", like any broadcast dim), assignment is the
  * native codegen'd [[NearestCentroid]] argmin (centroid matrix as a
  * codegen reference object — no k x dim literal trees), and the
  * re-estimation is one wide partial-aggregable sum per (cluster, dim):
  * each map task reduces its rows to k partial sums before the shuffle,
  * so the shuffle carries k rows per task regardless of input size.
  * No MLlib dependency, no RDDs, no per-row driver work; one Spark job
  * per Lloyd iteration.
  *
  * Reference origin: ny_taxi/MlLibNyTaxiExamples.scala:69-87 (KMeans on
  * trip feature vectors).
  */
object KMeans {

  /** struct(cluster, d2) of the nearest centroid for a vector column. */
  def assign(e: Column, cents: Array[Array[Double]]): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(NearestCentroid(
      org.apache.spark.sql.GraftSqlBridge.toExpression(e), cents))

  /** Run `iters` Lloyd iterations from the deterministic seed (the k
    * lowest vec_ids). Returns final centroids. */
  def fit(vecs0: DataFrame, k: Int, iters: Int): Array[Array[Double]] = {
    // each Lloyd iteration re-scans the vectors; persist once
    val vecs = vecs0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents: Array[Array[Double]] = vecs.orderBy(col("vec_id")).limit(k)
      .select(col("e")).collect()
      .map(_.getSeq[Double](0).toArray)
    val dim = cents.headOption.map(_.length).getOrElse(0)
    // element-wise sums: dim narrow aggregate columns (codegen'd, partial
    // aggregation on the map side), not a posexplode that multiplies every
    // row by dim before the shuffle
    val sums = (0 until dim).map(i =>
      sum(element_at(col("e"), i + 1)).as(s"s_$i"))
    for (_ <- 0 until iters) {
      val next = vecs
        .select(assign(col("e"), cents).getField("cluster").as("cluster"), col("e"))
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"), sums: _*)
        .collect()
        .map { r =>
          val n = r.getLong(1).toDouble
          r.getInt(0) -> Array.tabulate(dim)(i => r.getDouble(i + 2) / n)
        }
        .toMap
      // empty clusters keep their previous centroid
      cents = cents.zipWithIndex.map { case (old, i) => next.getOrElse(i, old) }
    }
    // fit-local cache: every iteration has materialized it; holding it
    // past return would leak one entry per fit() call (the FrameCache
    // rule — but this frame is parameter-dependent and fit-scoped, so
    // the right lifetime is the fit itself)
    vecs.unpersist(false)
    cents
  }

  /** Per-cluster size and inertia under the given centroids. */
  def profile(vecs: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    vecs.select(assign(col("e"), cents).as("a"))
      .groupBy(col("a.cluster").as("cluster"))
      .agg(count(lit(1)).as("n"), sum(col("a.d2")).as("inertia"))
      .orderBy(col("cluster"))
  }
}
