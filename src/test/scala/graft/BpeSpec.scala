package graft

import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}
  import spark.implicits._

  private def tk(texts: String*) = texts.toDF("text")
    .select(graft.functions.TextOps.toks(
      org.apache.spark.sql.functions.lower(
        org.apache.spark.sql.functions.col("text"))).as("tk"))

  test("planted corpus learns the exact merge sequence, greedily and in order") {
    // words: "abab" x3, "ab" x2.
    // round 1 pairs: (a,b) = 2*3 + 1*2 = 8, (b,a) = 1*3 = 3 -> merge (a,b)
    // round 2: abab = [ab, ab], ab = [ab] -> (ab,ab) = 3 -> merge
    // round 3: no adjacent pairs anywhere -> early stop
    val docs = tk("abab abab", "abab ab", "ab")
    val got = operators.Bpe.bpeMerges(docs, k = 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, "a", "b", "ab", 8L),
      (2L, "ab", "ab", "abab", 3L)),
      s"merge sequence diverged: ${got.mkString("|")}")
  }

  test("tie-break is deterministic: equal counts merge the lexicographically smallest pair") {
    // "xy" and "ab" both appear twice -> pair counts (a,b)=2, (x,y)=2;
    // (a,b) < (x,y) lexicographically and must win round 1
    val docs = tk("xy ab", "ab xy")
    val got = operators.Bpe.bpeMerges(docs, k = 1).collect()
    assert(got.length == 1)
    assert(got.head.getString(1) == "a" && got.head.getString(2) == "b")
  }

  test("greedy left-to-right: an odd run merges floor(n/2) non-overlapping occurrences") {
    // "aaa": greedy (a,a) merging gives [aa, a] — the sequential BPE
    // reference behavior; a naive pairwise count would claim 2 merges
    val docs = tk("aaa aaa")
    val got = operators.Bpe.bpeMerges(docs, k = 2).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.head == (("a", "a", "aa", 4L)), got.mkString("|"))
    // round 2 sees [aa, a] per word: top pair is (aa, a) with count 2
    assert(got(1) == (("aa", "a", "aaa", 2L)), got.mkString("|"))
  }

  test("q89 tokenize reproduces training's final segmentation on the planted corpus") {
    // words after the 2 learned merges ((a,b) then (ab,ab)):
    //   "abab" -> [abab] (1 token), "ab" -> [ab] (1 token)
    // docs: "abab abab" = 2 words, 8 chars, 2 tokens;
    //       "abab ab" = 2 words, 6 chars, 2 tokens; "ab" = 1/2/1
    val docs = Seq("abab abab", "abab ab", "ab").toDF("text")
    // driver BPE reference: sequential rank-order greedy application
    def applyRef(word: String, merges: Seq[(String, String)]): Seq[String] =
      merges.foldLeft(word.split("").toSeq) { case (syms, (l, r)) =>
        syms.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == l && x == r)
            acc.init :+ (l + r)
          else acc :+ x
        }
      }
    val spark2 = spark
    import spark2.implicits._
    val tkDocs = docs.select(graft.functions.TextOps.toks(
      org.apache.spark.sql.functions.lower(
        org.apache.spark.sql.functions.col("text"))).as("tk"))
    val merges = operators.Bpe.bpeMerges(tkDocs, 5).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges == Seq(("a", "b"), ("ab", "ab")))
    for (w <- Seq("abab", "ab")) {
      val expected = applyRef(w, merges)
      assert(expected.length == 1, s"reference tokenization drifted for $w")
    }
    // spark-side: planted corpus through the real q89 path needs a dir;
    // assert the LAW on testdata instead — tokenizing with the full
    // table can never produce more tokens than with a 1-merge table,
    // and never more tokens than characters (each merge only shrinks)
    val k1 = operators.Bpe.bpeTokenize(spark, sf, 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val kFull = operators.Bpe.bpeTokenize(spark, sf, operators.Bpe.DefaultMerges)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(k1.keySet == kFull.keySet)
    kFull.foreach { case (id, (chars, toks)) =>
      assert(toks <= k1(id)._2, s"doc $id: more tokens with more merges")
      assert(k1(id)._2 <= chars, s"doc $id: tokens exceed characters")
      assert(toks >= 1, s"doc $id: degenerate token count")
      assert(chars == k1(id)._1, s"doc $id: char count not invariant in k")
    }
  }

  test("q88 on testdata: consecutive ranks, positive counts, non-increasing frequency") {
    val rows = operators.Bpe.q88BpeVocab(spark, sf).collect()
    assert(rows.nonEmpty, "no merges learned on testdata")
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq,
      "ranks not consecutive")
    rows.foreach { r =>
      assert(r.getLong(4) > 0, s"non-positive pair count: $r")
      assert(r.getString(3) == r.getString(1) + r.getString(2),
        s"merged symbol is not left+right: $r")
    }
    // merged symbols are distinct: a pair can only be merged once
    val merged = rows.map(_.getString(3))
    assert(merged.distinct.length == merged.length, "duplicate merge learned")
  }

  test("q102 fertility laws: >=1 token per word, <=1 token per char, totals lockstep with q89") {
    val rep = graft.operators.Bpe.q102TokenFertility(spark, sf).collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      assert(r.getLong(4) >= 1000000L,
        s"fertility below 1 token/word for ${r.getString(0)}")
      assert(r.getLong(5) <= 1000000L,
        s"more BPE tokens than chars for ${r.getString(0)}")
    }
    // per-lang sums must re-aggregate exactly to q89's corpus totals
    val q89 = graft.operators.Bpe.q89BpeTokenize(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_words"),
        org.apache.spark.sql.functions.sum("n_bpe_tokens")).head()
    assert(rep.map(_.getLong(2)).sum == q89.getLong(0))
    assert(rep.map(_.getLong(3)).sum == q89.getLong(1))
  }
}
