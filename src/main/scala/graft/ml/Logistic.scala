package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed batch-gradient-descent logistic regression — the
  * GPT-3-style quality-classifier trainer (train a linear model on
  * "reference domain vs rest", filter the crawl by its score; see
  * Brown et al., NeurIPS'20 §A.2 and the fastText linear baseline it
  * cites).
  *
  * Execution contract (the KMeans/DecisionTree pattern): the driver
  * holds ONLY the (dim+1)-weight vector and the loss history; every
  * iteration is ONE partial-aggregable aggregate over the feature
  * frame computing the full-batch update direction and log-loss.
  * Per-row contributions cross the merge tree as 1e-9-scaled integer
  * sums (the q64/q85 rule), so training is bit-deterministic under
  * any partitioning of the data — and because the squash is rational
  * (see [[probability]]), the whole 20-round weight trajectory is
  * replayable in DuckDB as chained CTEs, making q90 oracle-exact.
  * The update direction mean((p - y) x) is the classic logistic
  * gradient shape applied to the rational squash (a perceptron-style
  * pseudo-gradient: (p - y) keeps the gradient's sign and saturation,
  * so the planted-corpus learnability laws in MlSpec hold unchanged).
  * Log-loss history is reported for monitoring only (libm log — never
  * part of an oracle-gated output).
  */
object Logistic {

  /** p = squash(w·x + b), clamped away from {0, 1} so log-loss stays
    * finite at any weight scale. The squash is the RATIONAL fast
    * sigmoid p = 0.5 + 0.5 * z / (1 + |z|) — same shape (monotone,
    * symmetric, p(0)=0.5, saturating) but built from +,*,/,abs only:
    * every operation is IEEE-754 correctly rounded and therefore
    * bit-identical in any engine, unlike libm exp whose last-ulp
    * differences would break the cross-engine oracle (q62/q96 rule).
    * The z accumulation order is fixed (left fold over features, bias
    * last) and mirrored token for token in the q90 oracle SQL. */
  private def probability(features: Seq[String], w: Array[Double]): Column = {
    val z = features.zipWithIndex
      .map { case (f, i) => col(f) * lit(w(i)) }
      .reduce(_ + _) + lit(w.last)
    val p = lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z))
    least(greatest(p, lit(1e-12)), lit(1.0 - 1e-12))
  }

  /** Score column for externally supplied weights (dim weights + bias
    * last) — the APPLY half once a model is trained. */
  def scoreExpr(features: Seq[String], weights: Array[Double]): Column =
    probability(features, weights)

  /** Train full-batch GD for `iters` rounds at rate `lr` on `df`
    * (numeric feature columns + 0/1 `label`). Returns the final
    * weights (bias last) and the per-iteration mean log-loss measured
    * BEFORE each step (so history(0) is the initial-weights loss).
    * Deterministic: zero init, fixed iteration count, integer-scaled
    * gradient sums. */
  def fit(df: DataFrame, features: Seq[String], label: Column,
      iters: Int, lr: Double): (Array[Double], Seq[Double]) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val dim = features.length
    val w = Array.fill(dim + 1)(0.0)
    val losses = scala.collection.mutable.ListBuffer.empty[Double]
    val y = label.cast("double")
    var it = 0
    while (it < iters) {
      val p = probability(features, w)
      // per-row contributions, 1e-9-scaled to integers so the shuffle
      // merge order cannot perturb the sums
      def iSum(c: Column) = sum(round(c * 1e9).cast("long"))
      val gradCols = features.zipWithIndex.map { case (f, i) =>
        iSum((p - y) * col(f)).as(s"g$i")
      } :+ iSum(p - y).as("gb") :+
        iSum(-(y * log(p) + (lit(1.0) - y) * log(lit(1.0) - p))).as("ll") :+
        count(lit(1)).as("n")
      val row = df.agg(gradCols.head, gradCols.tail: _*).collect().head
      val n = row.getLong(dim + 2).toDouble
      losses += row.getLong(dim + 1) / 1e9 / n
      var i = 0
      while (i <= dim) {
        w(i) -= lr * (row.getLong(i) / 1e9 / n)
        i += 1
      }
      it += 1
    }
    (w, losses.toSeq)
  }
}
