package graft

import graft.operators.{ScoredKey, TopKByScore}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Law-level properties that back the distributed-correctness claims:
  * a partial-aggregable Aggregator must give split-invariant results
  * (Spark may partition the input arbitrarily and merge in any shape),
  * and the exact-money scheme must round-trip every 2-decimal value. */
class PropertySpec extends AnyFunSuite {

  private val agg = new TopKByScore(5)

  private def reduceAll(xs: Seq[ScoredKey]): Seq[ScoredKey] =
    xs.foldLeft(agg.zero)(agg.reduce)

  private val keyGen = for {
    score <- Gen.chooseNum(-1e6, 1e6)
    key <- Gen.chooseNum(0L, 1000L)
  } yield ScoredKey(score, key)

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  test("TopKByScore is split-invariant: any partitioning + merge equals single-pass") {
    check(Prop.forAll(Gen.listOf(keyGen), Gen.chooseNum(0, 1000)) { (xs, cutSeed) =>
      val whole = reduceAll(xs)
      val cut = if (xs.isEmpty) 0 else cutSeed % (xs.length + 1)
      val (l, r) = xs.splitAt(cut)
      agg.merge(reduceAll(l), reduceAll(r)) == whole
    })
  }

  test("TopKByScore merge is commutative") {
    check(Prop.forAll(Gen.listOf(keyGen), Gen.listOf(keyGen)) { (xs, ys) =>
      val (bx, by) = (reduceAll(xs), reduceAll(ys))
      agg.merge(bx, by) == agg.merge(by, bx)
    })
  }

  test("cents round-trips every 2-decimal money value exactly") {
    check(Prop.forAll(Gen.chooseNum(-10000000L, 10000000L)) { c =>
      val asDouble = c / 100.0              // the parquet-stored 2-decimal value
      math.round(asDouble * 100) == c       // what Num.cents computes per row
    })
  }
}
