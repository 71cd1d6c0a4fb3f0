package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sampling/mixture operators (q74/q75) and the kNN graph (q73):
  * invariants beyond the oracle's exact-hash gate (determinism across
  * physical layouts, quota semantics, graph symmetry of rank-1 pairs). */
class SamplingSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("q74 draws an exact ranked quota per stratum, stable across layouts") {
    val rows = operators.Sampling.q74ReservoirSample(spark, sf).collect()
    assert(rows.nonEmpty)
    val perLang = rows.groupBy(_.getString(0))
    val total = Tables.documents(spark, sf).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, rs) =>
      assert(rs.length == math.min(20L, total(lang)),
        s"$lang drew ${rs.length} of avail ${total(lang)}")
      assert(rs.map(_.getLong(1)).sorted.sameElements(1L to rs.length))
    }
    // physical layout must not change the draw: the bounded aggregate's
    // merge order varies with partitioning, the result must not
    val again = operators.Sampling
      .reservoirFrom(Tables.documents(spark, sf).repartition(13)).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("q75 quotas follow the weight ladder and cap at availability") {
    val rows = operators.Sampling.q75MixtureSample(spark, sf).collect()
    assert(rows.nonEmpty)
    var shareSum = 0.0
    rows.foreach { r =>
      val (src, avail, quota, kept, chars, share) = (r.getString(0),
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      val idx = src.stripPrefix("src").toLong
      // mirror the production cap: quota = least(2*(idx+1), 40) — the
      // uncapped formula would false-fail any future source with idx >= 20
      assert(quota == math.min(2 * (idx + 1), 40L), s"$src quota $quota")
      assert(kept == math.min(quota, avail), s"$src kept $kept")
      assert(chars >= 0 && (kept > 0) == (chars > 0))
      shareSum += share
    }
    assert(math.abs(shareSum - 1.0) < 1e-9)
  }

  test("q73 kNN graph: ranked per-node lists; rank-1 edges of a planted pair meet") {
    val rows = operators.Similarity.q73KnnGraph(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    val perNode = rows.groupBy(_.getLong(0))
    assert(perNode.size == n)
    perNode.foreach { case (id, rs) =>
      assert(rs.length == math.min(3L, n - 1))
      val byRk = rs.sortBy(_.getLong(1))
      val cs = byRk.map(_.getDouble(3))
      assert(cs.sameElements(cs.sortBy(-_)), s"node $id not sorted")
      assert(!byRk.exists(_.getLong(2) == id), s"node $id lists itself")
    }
    // the graph is directed, but the globally most similar pair must be
    // each other's rank-1 neighbor (its cosine is both ends' maximum)
    val top = rows.filter(_.getLong(1) == 1L).maxBy(_.getDouble(3))
    val (a, b) = (top.getLong(0), top.getLong(2))
    val back = rows.find(r => r.getLong(0) == b && r.getLong(1) == 1L).get
    assert(back.getLong(2) == a, s"top pair $a<->$b not mutual at rank 1")
  }
}
