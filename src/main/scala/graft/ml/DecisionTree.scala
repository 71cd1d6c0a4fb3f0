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
  private[graft] def thresholds(df: DataFrame, features: Seq[String]): Map[String, Seq[Double]] = {
    val aggs = features.map(f =>
      percentile_approx(col(f), array((1 to 9).map(i => lit(i / 10.0)): _*), lit(1000)).as(f))
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    features.zipWithIndex.map { case (f, i) =>
      f -> row.getSeq[Double](i).distinct
    }.toMap
  }

  private case class Pending(id: Int, depth: Int, pred: Column,
      n: Long, pos: Long)

  /** Train to `maxDepth`, level by level, with ONE histogram aggregate
    * per level — the distributed-tree shape (Spark MLlib does the same):
    * every row is routed to its frontier node and each feature value is
    * binned against the candidate thresholds ONCE, then a single
    * `groupBy(node, feature, bin)` produces (count, positives) per bin —
    * at most nodes × features × (bins+1) tiny rows cross the shuffle
    * after map-side combine, and the driver scores every (node, feature,
    * threshold) split from cumulative bin sums. The previous per-
    * candidate conditional-sum formulation was nodes × candidates × 2
    * aggregate COLUMNS chunked into many full passes per level — it
    * measured 20.5 s at depth 5 / sf0.1; this shape is one pass per
    * level and produces bit-identical split statistics (bin b counts
    * rows with exactly b thresholds below the value, so "x <= t_j"
    * equals "bin < j" exactly). The maxDepth level runs NO pass at all:
    * a child's (n, pos) is already exact in its parent's chosen split
    * stats, so the deepest — widest — level's leaves are free. */
  def fit(df: DataFrame, features: Seq[String], label: Column,
      maxDepth: Int): Seq[Node] = {
    // maxDepth = 0 would return the root as a leaf whose (n, pos) are
    // still the sentinel seeds (no histogram pass ever runs), i.e. a
    // prediction independent of the data — reject it loudly rather than
    // regress silently. A depth-0 "tree" is a majority vote; callers
    // wanting one should aggregate directly.
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    val ths = thresholds(df, features)
    val done = scala.collection.mutable.ArrayBuffer.empty[Node]
    var frontier = List(Pending(0, 0, lit(true), -1L, -1L))
    var nextId = 1
    while (frontier.nonEmpty) {
      val depth = frontier.head.depth
      val perNode: Map[Int, Array[org.apache.spark.sql.Row]] =
        if (depth >= maxDepth) Map.empty // leaves; stats carried from parents
        else {
          val nid = frontier.foldLeft(lit(-1)) { (acc, p) =>
            when(p.pred, lit(p.id)).otherwise(acc)
          }
          val binCols = features.map { f =>
            ths(f).foldLeft(lit(0)) { (acc, t) =>
              acc + when(col(f) > t, 1).otherwise(0)
            }
          }
          df.select(nid.as("nid") +: label.as("y") +: Seq(
              posexplode(array(binCols: _*)).as(Seq("fi", "bin"))): _*)
            .filter(col("nid") >= 0)
            .groupBy(col("nid"), col("fi"), col("bin"))
            .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
            .collect()
            .groupBy(_.getInt(0))
        }
      var nextFrontier = List.empty[Pending]
      frontier.foreach { p =>
        val bins = perNode.getOrElse(p.id, Array.empty)
        // feature 0's bins partition the node's rows exactly once
        val f0 = bins.filter(_.getInt(1) == 0)
        val n = if (p.depth >= maxDepth) p.n else f0.map(_.getLong(3)).sum
        val pos = if (p.depth >= maxDepth) p.pos else f0.map(_.getLong(4)).sum
        val g = gini2(pos.toDouble, n.toDouble)
        val pred = if (2 * pos >= n) 1 else 0
        val best =
          if (p.depth >= maxDepth || g == 0.0) None
          else features.zipWithIndex.flatMap { case (f, fi) =>
            val byBin = bins.filter(_.getInt(1) == fi)
              .map(r => r.getInt(2) -> (r.getLong(3), r.getLong(4))).toMap
            // cumulative over bins: split "x <= ths(f)(j)" keeps bins <= j left
            val cums = (0 to ths(f).size).scanLeft((0L, 0L)) { case ((cn, cp), b) =>
              val (bn, bp) = byBin.getOrElse(b, (0L, 0L))
              (cn + bn, cp + bp)
            }
            ths(f).zipWithIndex.flatMap { case (t, j) =>
              val (ln, lp) = cums(j + 1)
              val (rn, rp) = (n - ln, pos - lp)
              if (ln == 0 || rn == 0) None
              else Some((f, t, ln, lp, (ln.toDouble / n) * gini2(lp.toDouble, ln.toDouble)
                + (rn.toDouble / n) * gini2(rp.toDouble, rn.toDouble)))
            }
          }.sortBy { case (f, t, _, _, wg) => (wg, f, t) }.headOption
            .filter { case (_, _, _, _, wg) => wg < g - 1e-12 }
        best match {
          case None =>
            done += Node(p.id, p.depth, null, Double.NaN, n, g, pred, -1, -1)
          case Some((f, t, ln, lp, _)) =>
            val (l, r) = (nextId, nextId + 1)
            nextId += 2
            done += Node(p.id, p.depth, f, t, n, g, pred, l, r)
            nextFrontier ::= Pending(l, p.depth + 1, p.pred && col(f) <= t, ln, lp)
            nextFrontier ::= Pending(r, p.depth + 1, p.pred && col(f) > t,
              n - ln, pos - lp)
        }
      }
      frontier = nextFrontier.reverse
    }
    done.sortBy(_.id).toSeq
  }

  /** Reduced-error pruning on a held-out prune set with a significance
    * margin: bottom-up, an internal node collapses to a leaf unless its
    * subtree beats the leaf (predicting the node's train-majority class)
    * on the prune set by MORE than `z` binomial standard deviations
    * (margin z·√n_reach — the pessimistic-pruning idea behind C4.5's
    * confidence bound). A pure-noise split's prune-set advantage is
    * mean-zero with sd ≤ √n_reach, so it cannot clear the margin except
    * with ~P(Z>z) luck and the tree collapses to its root on
    * uninformative features (the honest model); a real split's advantage
    * grows linearly in n_reach and clears it easily. Plain
    * reduced-error pruning (z = 0) keeps every noise split that got
    * lucky on the prune sample — measured: it still graded below the
    * majority baseline on held-out test data.
    *
    * Distributed shape: ONE job — every prune row is routed to its LEAF
    * (the predictExpr path as a leaf-id expression) and one
    * `groupBy(leaf, label)` histogram comes back; every node's (reach,
    * correct-as-leaf, subtree-correct) is then O(#nodes) bottom-up
    * arithmetic over those ≤ leaves × classes counts on the driver,
    * never rows. Pruned subtrees are dropped from the returned table. */
  def pruneReducedError(nodes: Seq[Node], df: DataFrame,
      label: Column, z: Double = 2.0): Seq[Node] = {
    if (nodes.isEmpty) return nodes
    val hist = df.select(leafIdExpr(nodes).as("leaf"), label.as("y"))
      .groupBy(col("leaf"), col("y"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    pruneFromHist(nodes, hist, z)
  }

  /** Leaf-id routing expression for a trained tree — every row maps to
    * the id of the leaf it falls in. Exposed so a caller can fuse the
    * prune histogram with OTHER per-leaf tallies in one pass (q63's
    * combined prune + accuracy aggregate). */
  def leafIdExpr(nodes: Seq[Node]): Column = {
    val byId = nodes.map(n => n.id -> n).toMap
    def build(id: Int): Column = {
      val nd = byId(id)
      if (nd.leftId < 0) lit(nd.id)
      else when(col(nd.feature) <= nd.threshold, build(nd.leftId))
        .otherwise(build(nd.rightId))
    }
    build(0)
  }

  /** The pruning arithmetic off an already-collected per-(leaf, label)
    * prune-set histogram — O(#nodes) driver work, no Spark job. */
  private[graft] def pruneFromHist(nodes: Seq[Node],
      hist: Map[(Int, Long), Long], z: Double): Seq[Node] = {
    if (nodes.isEmpty) return nodes
    // bottom-up: per-node class counts = sum over its leaves
    val classCnt = scala.collection.mutable.Map.empty[Int, (Long, Long)]
    val subtreeCorrect = scala.collection.mutable.Map.empty[Int, Long]
    val collapsed = scala.collection.mutable.Set.empty[Int]
    nodes.sortBy(n => -n.depth).foreach { n =>
      val (c0, c1) =
        if (n.leftId < 0)
          (hist.getOrElse((n.id, 0L), 0L), hist.getOrElse((n.id, 1L), 0L))
        else {
          val (l0, l1) = classCnt(n.leftId)
          val (r0, r1) = classCnt(n.rightId)
          (l0 + r0, l1 + r1)
        }
      classCnt(n.id) = (c0, c1)
      val leafCorrect = if (n.prediction == 1) c1 else c0
      if (n.leftId < 0) subtreeCorrect(n.id) = leafCorrect
      else {
        val subC = subtreeCorrect(n.leftId) + subtreeCorrect(n.rightId)
        val margin = z * math.sqrt((c0 + c1).toDouble)
        if (subC - leafCorrect <= margin) {
          collapsed += n.id
          subtreeCorrect(n.id) = leafCorrect
        } else subtreeCorrect(n.id) = subC
      }
    }
    // drop descendants of collapsed nodes; collapsed nodes become leaves
    val parentOf: Map[Int, Int] = nodes.flatMap(n =>
      Seq(n.leftId -> n.id, n.rightId -> n.id)).filter(_._1 >= 0).toMap
    def live(id: Int): Boolean = parentOf.get(id) match {
      case None => true
      case Some(p) => !collapsed.contains(p) && live(p)
    }
    nodes.filter(n => live(n.id)).map { n =>
      if (collapsed.contains(n.id)) n.copy(feature = null,
        threshold = Double.NaN, leftId = -1, rightId = -1)
      else n
    }
  }

  /** Prediction of the PRUNED tree as a function of a row's GROWN leaf:
    * pruning only merges leaves, so every grown leaf's rows share one
    * pruned-tree prediction — the deepest surviving pruned LEAF on the
    * grown leaf's root path. Lets a per-grown-leaf histogram grade the
    * pruned tree without another pass (the same counts predictExpr
    * would re-tally row by row). */
  def prunedLeafPrediction(grown: Seq[Node], pruned: Seq[Node]): Int => Int = {
    val prunedLeaves = pruned.filter(_.leftId < 0)
      .map(n => n.id -> n.prediction).toMap
    val parentOf: Map[Int, Int] = grown.flatMap(n =>
      Seq(n.leftId -> n.id, n.rightId -> n.id)).filter(_._1 >= 0).toMap
    (leaf: Int) => {
      var id = leaf
      while (!prunedLeaves.contains(id)) id = parentOf(id)
      prunedLeaves(id)
    }
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
