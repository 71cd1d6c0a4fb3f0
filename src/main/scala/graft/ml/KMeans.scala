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

  // ---------------------------------------------------------------- //
  // Quantized-exact Lloyd's: every number in the fit is an integer,  //
  // so the whole 5-iteration trajectory is bit-deterministic under   //
  // ANY partitioning / merge order AND replayable in plain SQL — the //
  // q96 chained-CTE precedent, giving q62 a DuckDB oracle instead of //
  // a rows-only tier. Vectors are 1e-7-quantized (the q64 rule),     //
  // centroids live on the same grid via floor division, and          //
  // assignment is an exact integer argmin (d2 = rr - 2 r·c + cc via  //
  // the codegen'd [[graft.functions.LongDot]]) with lowest-cluster   //
  // tie-break. Overflow: |r| <= ~2e7 (unit-scale embeddings), so     //
  // per-row d2 <= dim * (4e7)^2 ~ 1e17 < 2^63; only the cross-row    //
  // inertia sum needs DECIMAL(38,0).                                 //
  // ---------------------------------------------------------------- //

  private def ldot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(graft.functions.LongDot(
      org.apache.spark.sql.GraftSqlBridge.toExpression(a),
      org.apache.spark.sql.GraftSqlBridge.toExpression(b)))

  /** struct(d2, cluster) of the nearest quantized centroid for an
    * array<bigint> vector column: exact integer distances, ties to the
    * lowest cluster id (array_sort on the (d2, cluster) struct pairs —
    * lexicographic, so the comparison chain is total and portable). */
  def assignQuantized(r: Column, cents: Array[Array[Long]]): Column = {
    val rr = ldot(r, r)
    val pairs = cents.zipWithIndex.map { case (c, i) =>
      val cc = c.map(x => x * x).sum
      struct((rr - lit(2L) * ldot(r, typedlit(c.toSeq)) + lit(cc)).as("d2"),
        lit(i).as("cluster"))
    }
    element_at(array_sort(array(pairs: _*)), 1)
  }

  /** Lloyd iterations on 1e-7-quantized vectors `(vec_id, r:
    * array<bigint>)` from the deterministic seed (the k lowest
    * vec_ids). Centroid update is exact floor division onto the same
    * integer grid (`Math.floorDiv`, mirrored in SQL by the portable
    * `(s - ((s % n) + n) % n) / n` — DuckDB's `//` truncates, so the
    * mod form is the cross-engine floor); empty clusters keep their
    * previous centroid. Returns the final integer centroids. */
  def fitQuantized(rvecs0: DataFrame, k: Int, iters: Int): Array[Array[Long]] = {
    val rvecs = rvecs0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents: Array[Array[Long]] = rvecs.orderBy(col("vec_id")).limit(k)
      .select(col("r")).collect()
      .map(_.getSeq[Long](0).toArray)
    val dim = cents.headOption.map(_.length).getOrElse(0)
    val sums = (0 until dim).map(i =>
      sum(element_at(col("r"), i + 1)).as(s"s_$i"))
    for (_ <- 0 until iters) {
      val next = rvecs
        .select(assignQuantized(col("r"), cents).getField("cluster").as("cluster"),
          col("r"))
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"), sums: _*)
        .collect()
        .map { r =>
          val n = r.getLong(1)
          r.getInt(0) -> Array.tabulate(dim)(i => Math.floorDiv(r.getLong(i + 2), n))
        }
        .toMap
      cents = cents.zipWithIndex.map { case (old, i) => next.getOrElse(i, old) }
    }
    rvecs.unpersist(false)
    cents
  }

  /** Per-cluster size and inertia under quantized centroids; inertia is
    * the exact integer d2 sum (DECIMAL(38,0) — it can pass 2^63 across
    * rows) reported in original squared units (one deterministic double
    * division by 1e14). */
  def profileQuantized(rvecs: DataFrame, cents: Array[Array[Long]]): DataFrame =
    rvecs.select(assignQuantized(col("r"), cents).as("a"))
      .groupBy(col("a.cluster").cast("long").as("cluster"))
      .agg(count(lit(1)).as("n"),
        (sum(col("a.d2").cast("decimal(38,0)")).cast("double") / 1e14).as("inertia"))
      .orderBy(col("cluster"))
}
