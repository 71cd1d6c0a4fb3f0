package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lloyd's algorithm over a `(vec_id, e: array<double>)` DataFrame,
  * Spark-first: centroids are driver-held k x dim state (k rows — the
  * legitimate "small side", like any broadcast dim), assignment is a
  * codegen'd argmin over k squared-distance expressions, and the
  * re-estimation is a posexplode + partial-aggregable avg per
  * (cluster, dim). No MLlib dependency, no RDDs, no per-row driver work.
  *
  * Reference origin: ny_taxi/MlLibNyTaxiExamples.scala:69-87 (KMeans on
  * trip feature vectors).
  */
object KMeans {
  /** Squared L2 distance between a vector column and a literal centroid,
    * via ||e||^2 + ||c||^2 - 2 e.c with the native codegen'd dot — one
    * tight loop per centroid instead of a zipped-array fold. ||e||^2 is
    * shared across all k distances (argmin is invariant to it but keeping
    * it makes the profile() inertia a true squared distance). */
  private def sqDist(e: Column, c: Array[Double]): Column = {
    val cc = c.map(x => x * x).sum
    graft.functions.VectorOps.norm2(e) + lit(cc) -
      lit(2.0) * graft.functions.VectorOps.dot(e, array(c.map(lit): _*))
  }

  /** Deterministic argmin over k centroids (ties -> lowest cluster id). */
  def assignExpr(e: Column, cents: Array[Array[Double]]): Column = {
    val dists = cents.map(c => sqDist(e, c))
    val m = least(dists: _*)
    dists.zipWithIndex.tail.foldLeft(when(dists.head === m, 0)) {
      case (acc, (d, i)) => acc.when(d === m, i)
    }.cast("int")
  }

  /** Run `iters` Lloyd iterations from the deterministic seed (the k
    * lowest vec_ids). Returns final centroids. */
  def fit(vecs0: DataFrame, k: Int, iters: Int): Array[Array[Double]] = {
    // each Lloyd iteration re-scans the vectors; persist once
    val vecs = vecs0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents: Array[Array[Double]] = vecs.orderBy(col("vec_id")).limit(k)
      .select(col("e")).collect()
      .map(_.getSeq[Double](0).toArray)
    for (_ <- 0 until iters) {
      val assigned = vecs.withColumn("cluster", assignExpr(col("e"), cents))
      val next = assigned
        .select(col("cluster"), posexplode(col("e")).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cluster"), transform(col("pm"), x => x.getField("m")).as("c"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
        .toMap
      // empty clusters keep their previous centroid
      cents = cents.zipWithIndex.map { case (old, i) => next.getOrElse(i, old) }
    }
    cents
  }

  /** Per-cluster size and inertia under the given centroids. */
  def profile(vecs: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    val assigned = vecs.withColumn("cluster", assignExpr(col("e"), cents))
    val dist = cents.zipWithIndex.map { case (c, i) =>
      when(col("cluster") === i, sqDist(col("e"), c))
    }.reduceRight(_.otherwise(_)) // right-fold: each when-chain closed once
    assigned.withColumn("d2", coalesce(dist, lit(0.0)))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), sum(col("d2")).as("inertia"))
      .orderBy(col("cluster"))
  }
}
