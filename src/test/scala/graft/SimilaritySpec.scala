package graft

import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("q51 LSH ANN finds a meaningful fraction of the true top-10") {
    val exact = operators.Similarity.q50KnnBrute(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val ann = operators.Similarity.q51KnnLsh(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(ann.nonEmpty, "LSH returned no candidates")
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.2, s"recall@10 too low: $recall (ann=$ann exact=$exact)")
  }

  test("q51 probes fewer vectors than brute force") {
    // candidate set must be a strict subset of the corpus, else LSH
    // degenerated to brute force
    val n = Tables.embeddings(spark, sf).count()
    val annRows = operators.Similarity.q51KnnLsh(spark, sf).count()
    assert(annRows <= 10)
    assert(n > 10, "corpus too small for the test to mean anything")
  }

  test("q53 centroid probe results are a subset of the probed cells") {
    val rows = operators.Similarity.q53CentroidSearch(spark, sf).collect()
    assert(rows.nonEmpty)
    val labels = rows.map(_.getInt(1)).toSet
    assert(labels.size <= 2, s"probe leaked outside 2 cells: $labels")
  }

  test("q52 returns at most 3 ranked pairs per label, ordered") {
    val rows = operators.Similarity.q52PairwiseTopk(spark, sf).collect()
    val byLabel = rows.groupBy(_.getInt(0))
    byLabel.foreach { case (l, rs) =>
      assert(rs.length <= 3, s"label $l has ${rs.length} pairs")
      val coss = rs.sortBy(_.getLong(1)).map(_.getDouble(4))
      assert(coss.sameElements(coss.sortBy(-_)), s"label $l not rank-ordered")
    }
  }
}
