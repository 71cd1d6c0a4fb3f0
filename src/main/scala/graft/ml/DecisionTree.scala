package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy CART-style decision tree on DataFrame aggregates.
  *
  * Reference origin: ny_taxi/MlLibNyTaxiExamples.scala (DecisionTree
  * .trainClassifier on trip features). Spark-first re-expression: split
  * search is ONE aggregate pass per node computing, for every candidate
  * (feature, threshold), the left/right class counts as conditional sums
  * — partial-aggregable, no shuffle beyond the single-row aggregate, and
  * the driver only ever sees per-split statistics (never data rows).
  * Candidate thresholds are feature deciles from approx_percentile.
  */
object DecisionTree {
  /** A trained node: leaf (feature == null) or internal split. */
  case class Node(id: Int, depth: Int, feature: String, threshold: Double,
      n: Long, gini: Double, prediction: Int)

  private def gini2(pos: Double, n: Double): Double =
    if (n <= 0) 0.0 else { val p = pos / n; 2.0 * p * (1.0 - p) }

  /** Candidate thresholds per feature: interior deciles. */
  private def thresholds(df: DataFrame, features: Seq[String]): Map[String, Seq[Double]] = {
    val aggs = features.map(f =>
      percentile_approx(col(f), array((1 to 9).map(i => lit(i / 10.0)): _*), lit(1000)).as(f))
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    features.zipWithIndex.map { case (f, i) =>
      f -> row.getSeq[Double](i).distinct
    }.toMap
  }

  /** One aggregate pass scoring every (feature, threshold) split of `df`. */
  private def bestSplit(df: DataFrame, features: Seq[String], label: Column,
      ths: Map[String, Seq[Double]]): Option[(String, Double, Double)] = {
    val cands = for { f <- features; t <- ths(f) } yield (f, t)
    if (cands.isEmpty) return None
    val aggs = Seq(count(lit(1)).as("n"), sum(label).as("pos")) ++
      cands.zipWithIndex.flatMap { case ((f, t), i) =>
        Seq(
          sum(when(col(f) <= t, 1L).otherwise(0L)).as(s"ln_$i"),
          sum(when(col(f) <= t, label).otherwise(lit(0L))).as(s"lp_$i"))
      }
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    val n = row.getAs[Long]("n").toDouble
    val pos = row.getAs[Long]("pos").toDouble
    val parent = gini2(pos, n)
    val scored = cands.zipWithIndex.flatMap { case ((f, t), i) =>
      val ln = row.getAs[Long](s"ln_$i").toDouble
      val lp = row.getAs[Long](s"lp_$i").toDouble
      val rn = n - ln
      val rp = pos - lp
      if (ln == 0 || rn == 0) None
      else Some((f, t, (ln / n) * gini2(lp, ln) + (rn / n) * gini2(rp, rn)))
    }
    // deterministic arg-min: weighted gini, then feature name, then threshold
    scored.sortBy { case (f, t, g) => (g, f, t) }.headOption
      .filter { case (_, _, g) => g < parent - 1e-12 }
  }

  /** Train to `maxDepth`; returns the node table (pre-order ids). */
  def fit(df: DataFrame, features: Seq[String], label: Column,
      maxDepth: Int): Seq[Node] = {
    val ths = thresholds(df, features)
    var nextId = 0
    def grow(part: DataFrame, depth: Int): Seq[Node] = {
      val id = nextId; nextId += 1
      val r = part.agg(count(lit(1)).as("n"), sum(label).as("pos")).collect().head
      val n = r.getAs[Long]("n")
      val pos = r.getAs[Long]("pos")
      val g = gini2(pos.toDouble, n.toDouble)
      val pred = if (2 * pos >= n) 1 else 0
      val split = if (depth >= maxDepth || g == 0.0) None
        else bestSplit(part, features, label, ths)
      split match {
        case None => Seq(Node(id, depth, null, Double.NaN, n, g, pred))
        case Some((f, t, _)) =>
          Node(id, depth, f, t, n, g, pred) +:
            (grow(part.filter(col(f) <= t), depth + 1) ++
              grow(part.filter(col(f) > t), depth + 1))
      }
    }
    grow(df, 0)
  }

  /** Prediction column for a trained tree (nested when-expression). */
  def predictExpr(nodes: Seq[Node]): Column = {
    val byId = nodes.map(nd => nd.id -> nd).toMap
    // children of a pre-order node: left = id+1, right = id + 1 + size(left subtree)
    def subtreeSize(id: Int): Int = {
      val nd = byId(id)
      if (nd.feature == null) 1
      else 1 + subtreeSize(id + 1) + subtreeSize(id + 1 + subtreeSize(id + 1))
    }
    def build(id: Int): Column = {
      val nd = byId(id)
      if (nd.feature == null) lit(nd.prediction)
      else when(col(nd.feature) <= nd.threshold, build(id + 1))
        .otherwise(build(id + 1 + subtreeSize(id + 1)))
    }
    build(0)
  }
}
