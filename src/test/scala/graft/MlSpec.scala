package graft

import graft.functions.VectorOps
import graft.ml.KMeans
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class MlSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  private def vecs = Tables.embeddings(spark, sf)
    .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("e"))

  test("kmeans inertia is non-increasing across Lloyd iterations") {
    def inertia(iters: Int): Double = {
      val cents = KMeans.fit(vecs, k = 4, iters = iters)
      KMeans.profile(vecs, cents).collect().map(_.getDouble(2)).sum
    }
    val i1 = inertia(1)
    val i3 = inertia(3)
    val i6 = inertia(6)
    assert(i3 <= i1 + 1e-9, s"inertia rose: iter1=$i1 iter3=$i3")
    assert(i6 <= i3 + 1e-9, s"inertia rose: iter3=$i3 iter6=$i6")
  }

  test("kmeans assigns every vector to a valid cluster") {
    val n = vecs.count()
    val prof = operators.MlStats.q62Kmeans(spark, sf).collect()
    assert(prof.map(_.getLong(1)).sum == n)
    assert(prof.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 8))
  }

  test("q63 decision tree beats (or ties) the majority baseline on training data") {
    val rows = operators.MlStats.q63DecisionTree(spark, sf).collect()
    assert(rows.nonEmpty)
    val acc = rows.head.getDouble(9)
    val baseline = rows.head.getDouble(10)
    assert(acc >= baseline - 1e-12, s"tree acc $acc below majority $baseline")
    // pre-order node table: root first, leaves have null feature
    assert(rows.head.getLong(0) == 0L)
    assert(rows.exists(_.isNullAt(2)), "tree has no leaves?")
  }

  test("q61 correlations are in [-1, 1] and corr(x, x) would be 1") {
    val rows = operators.MlStats.q61Corr(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= -1.0 && c <= 1.0, s"corr out of range: $c")
    }
  }

  test("q64 embedding stats cover every dim with consistent moments") {
    val rows = operators.MlStats.q64EmbeddingStats(TestSpark.spark, TestSpark.sf)
      .collect()
    val dim = rows.length
    assert(dim > 0)
    assert(rows.map(_.getLong(0)).toSeq == (0L until dim.toLong),
      "positions not contiguous from 0")
    val counts = rows.map(_.getLong(1)).toSet
    assert(counts.size == 1, s"ragged dim counts: $counts")
    rows.foreach { r =>
      val (mn, mx, mean, v) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(mn <= mx)
      // mean is over the 1e-7-quantized values: allow that epsilon at
      // the boundary
      assert(mean >= mn - 1e-6 && mean <= mx + 1e-6,
        s"pos ${r.getLong(0)}: mean $mean outside [$mn, $mx]")
      assert(v >= -1e-12, s"pos ${r.getLong(0)}: negative variance $v")
      assert(v <= (mx - mn) * (mx - mn), "variance above range bound")
    }
  }
}
