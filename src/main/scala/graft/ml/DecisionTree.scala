package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy CART-style decision tree on DataFrame aggregates, trained
  * LEVEL-WISE: one aggregate pass scores every (node, feature,
  * threshold) candidate of the whole level at once (per-node conditional
  * sums gated on the node's path predicate), so the number of Spark jobs
  * is the tree depth, not the node count — the shape distributed tree
  * learners use. The driver only ever sees split statistics, never rows.
  *
  * Reference origin: ny_taxi/MlLibNyTaxiExamples.scala (DecisionTree
  * .trainClassifier on trip features). Candidate thresholds are feature
  * deciles from approx_percentile over the full input.
  */
object DecisionTree {
  /** A trained node; leftId/rightId are -1 for leaves. */
  case class Node(id: Int, depth: Int, feature: String, threshold: Double,
      n: Long, gini: Double, prediction: Int, leftId: Int, rightId: Int)

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

  private case class Pending(id: Int, depth: Int, pred: Column)

  /** Train to `maxDepth`, level by level. */
  def fit(df: DataFrame, features: Seq[String], label: Column,
      maxDepth: Int): Seq[Node] = {
    val ths = thresholds(df, features)
    val cands = for { f <- features; t <- ths(f) } yield (f, t)
    val done = scala.collection.mutable.ArrayBuffer.empty[Node]
    var frontier = List(Pending(0, 0, lit(true)))
    var nextId = 1
    while (frontier.nonEmpty) {
      // ONE aggregate pass for the whole level; nodes already at maxDepth
      // are leaves — they only need (n, pos), not the full candidate
      // split-score block (the deepest level has the most nodes, so this
      // cuts the widest pass from nodes x candidates to nodes x 2 cols)
      val aggs = frontier.zipWithIndex.flatMap { case (p, pi) =>
        Seq(
          sum(when(p.pred, 1L).otherwise(0L)).as(s"n_$pi"),
          sum(when(p.pred, label).otherwise(0L)).as(s"pos_$pi")) ++
          (if (p.depth >= maxDepth) Seq.empty
           else cands.zipWithIndex.flatMap { case ((f, t), ci) =>
            Seq(
              sum(when(p.pred && col(f) <= t, 1L).otherwise(0L)).as(s"ln_${pi}_$ci"),
              sum(when(p.pred && col(f) <= t, label).otherwise(0L)).as(s"lp_${pi}_$ci"))
          })
      }
      // chunk below spark.sql.codegen.maxFields (100): a wider aggregate
      // silently falls back to interpreted rows (measured 2x slower)
      val stat: Map[String, Long] = aggs.grouped(90).flatMap { batch =>
        val r = df.agg(batch.head, batch.tail: _*).collect().head
        r.schema.fieldNames.map(fn => fn -> r.getAs[Long](fn))
      }.toMap
      var nextFrontier = List.empty[Pending]
      frontier.zipWithIndex.foreach { case (p, pi) =>
        val n = stat(s"n_$pi")
        val pos = stat(s"pos_$pi")
        val g = gini2(pos.toDouble, n.toDouble)
        val pred = if (2 * pos >= n) 1 else 0
        val best =
          if (p.depth >= maxDepth || g == 0.0) None
          else cands.zipWithIndex.flatMap { case ((f, t), ci) =>
            val ln = stat(s"ln_${pi}_$ci").toDouble
            val lp = stat(s"lp_${pi}_$ci").toDouble
            val (rn, rp) = (n - ln, pos - lp)
            if (ln == 0 || rn == 0) None
            else Some((f, t, (ln / n) * gini2(lp, ln) + (rn / n) * gini2(rp, rn.toDouble)))
          }.sortBy { case (f, t, wg) => (wg, f, t) }.headOption
            .filter { case (_, _, wg) => wg < g - 1e-12 }
        best match {
          case None =>
            done += Node(p.id, p.depth, null, Double.NaN, n, g, pred, -1, -1)
          case Some((f, t, _)) =>
            val (l, r) = (nextId, nextId + 1)
            nextId += 2
            done += Node(p.id, p.depth, f, t, n, g, pred, l, r)
            nextFrontier ::= Pending(l, p.depth + 1, p.pred && col(f) <= t)
            nextFrontier ::= Pending(r, p.depth + 1, p.pred && col(f) > t)
        }
      }
      frontier = nextFrontier.reverse
    }
    done.sortBy(_.id).toSeq
  }

  /** Prediction column for a trained tree (nested when-expression). */
  def predictExpr(nodes: Seq[Node]): Column = {
    val byId = nodes.map(nd => nd.id -> nd).toMap
    def build(id: Int): Column = {
      val nd = byId(id)
      if (nd.leftId < 0) lit(nd.prediction)
      else when(col(nd.feature) <= nd.threshold, build(nd.leftId))
        .otherwise(build(nd.rightId))
    }
    build(0)
  }
}
