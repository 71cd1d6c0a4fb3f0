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

  private val bk = new operators.BottomKByHash(5)

  private def bkReduceAll(xs: Seq[operators.HashedRow]): Seq[operators.HashedRow] =
    xs.foldLeft(bk.zero)(bk.reduce)

  private val rowGen = for {
    // full 61-bit hash range: the reason this aggregate exists is that
    // these keys do NOT fit a double's mantissa
    hk <- Gen.chooseNum(0L, (1L << 61) - 1)
    id <- Gen.chooseNum(0L, 1000L)
    payload <- Gen.chooseNum(0L, 100000L)
  } yield operators.HashedRow(hk, id, payload)

  test("BottomKByHash is split-invariant and equals sort-take") {
    check(Prop.forAll(Gen.listOf(rowGen), Gen.chooseNum(0, 1000)) { (xs, cutSeed) =>
      val whole = bkReduceAll(xs)
      val cut = if (xs.isEmpty) 0 else cutSeed % (xs.length + 1)
      val (l, r) = xs.splitAt(cut)
      val merged = bk.merge(bkReduceAll(l), bkReduceAll(r))
      val oracle = xs.sortBy(x => (x.hk, x.id)).take(5)
      merged == whole && whole == oracle
    })
  }

  test("Morton key preserves box locality: max interleave bounds both coordinates") {
    // every z-value in [z(lo), z(hi)] for an aligned power-of-two box
    // decodes to coordinates inside that box — the row-group pruning
    // argument in miniature (checked on random aligned 16-bit boxes).
    // z() below must BE the production key, so it is first pinned to
    // ZOrderStore.interleave16 over a random sweep — without that
    // anchor this property would certify a test-local copy.
    val boxGen = for {
      bits <- Gen.chooseNum(0, 8)
      ax <- Gen.chooseNum(0, (1 << (16 - bits)) - 1)
      by <- Gen.chooseNum(0, (1 << (16 - bits)) - 1)
    } yield (bits, ax.toLong << bits, by.toLong << bits)
    def z(a: Long, b: Long): Long =
      (0 until 16).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    def unz(v: Long): (Long, Long) = (
      (0 until 16).map(i => ((v >> (2 * i)) & 1L) << i).reduce(_ | _),
      (0 until 16).map(i => ((v >> (2 * i + 1)) & 1L) << i).reduce(_ | _))
    locally {
      import TestSpark.spark
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val rnd = new scala.util.Random(5)
      val pairs = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
      val prod = pairs.toDF("a", "b")
        .select(graft.sources.ZOrderStore.interleave16(col("a"), col("b")).as("z"))
        .collect().map(_.getLong(0))
      assert(prod.sameElements(pairs.map((z _).tupled)),
        "test-local z() diverges from ZOrderStore.interleave16")
    }
    check(Prop.forAll(boxGen, Gen.chooseNum(0L, Long.MaxValue)) { case ((bits, a0, b0), seed) =>
      val side = 1L << bits
      val (zLo, zHi) = (z(a0, b0), z(a0 + side - 1, b0 + side - 1))
      val v = zLo + (if (zHi == zLo) 0L else math.abs(seed % (zHi - zLo + 1)))
      val (a, b) = unz(v)
      a >= a0 && a < a0 + side && b >= b0 && b < b0 + side
    })
  }

  test("tokenHashes64 mix is injective on the fold domain and keeps bit 63 clear") {
    // The law behind the q43 band-rank claims: the mix
    //   h = a ^ (b << 30) ^ ((a ^ b) << 33)
    // over fold values a, b < P < 2^30 must lose NOTHING (decode
    // recovers (a, b) from h — 60 bits in, 60 bits out) and must never
    // set bit 63 (the DuckDB twin's shift-overflow contract).
    def mix(a: Long, b: Long): Long = a ^ (b << 30) ^ ((a ^ b) << 33)
    def decode(h: Long): (Long, Long) = {
      val a = h & ((1L << 30) - 1)
      var b = (h >> 30) & 7L // bits 30-32 are pure b_0..2
      for (i <- 33 until 60) {
        // h_i = b_(i-30) ^ a_(i-33) ^ b_(i-33), earlier b bits known
        val bit = ((h >> i) & 1L) ^ ((a >> (i - 33)) & 1L) ^ ((b >> (i - 33)) & 1L)
        b |= bit << (i - 30)
      }
      (a, b)
    }
    val foldGen = Gen.chooseNum(0L, functions.TextOps.P - 1)
    check(Prop.forAll(foldGen, foldGen) { (a, b) =>
      val h = mix(a, b)
      (h >>> 63) == 0L && decode(h) == ((a, b))
    })
    // and the test-local mix IS the shipped column expression: compare
    // against TextOps.tokenHashes64 ∘ polyHash on random ASCII tokens
    locally {
      import TestSpark.spark
      import spark.implicits._
      import org.apache.spark.sql.functions.{array, col}
      val rnd = new scala.util.Random(17)
      val toks = Seq.fill(100)(
        (1 to rnd.nextInt(12) + 1).map(_ => (rnd.nextInt(94) + 33).toChar).mkString)
      val got = toks.toDF("w").select(
        functions.TextOps.polyHash(col("w"), 31L).as("a"),
        functions.TextOps.polyHash(col("w"), 37L).as("b"),
        functions.TextOps.tokenHashes64(array(col("w"))).getItem(0).as("h"))
        .collect()
      got.foreach { r =>
        assert(r.getLong(2) == mix(r.getLong(0), r.getLong(1)),
          s"test-local mix diverges from tokenHashes64 for folds " +
            s"(${r.getLong(0)}, ${r.getLong(1)})")
      }
    }
  }
}
