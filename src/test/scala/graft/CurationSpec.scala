package graft

import org.scalatest.funsuite.AnyFunSuite

/** Corpus-curation operators (q38/q39/q47): structural invariants the
  * oracle's exact-hash gate cannot phrase (bounds, monotonicity,
  * stratification semantics). */
class CurationSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("q38 vocab head is frequency-sorted with df <= tf and df <= corpus size") {
    val nDocs = Tables.documents(spark, sf).count()
    val rows = operators.Text.q38VocabTopk(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    val tfs = rows.map(_.getLong(1))
    assert(tfs.sameElements(tfs.sortBy(-_)), "not sorted by tf desc")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"df > tf for ${r.getString(0)}")
      assert(r.getLong(2) <= nDocs)
    }
  }

  test("q38b sketch df tracks the exact df within HLL tolerance") {
    val exact = operators.Text.q38VocabTopk(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val approx = operators.Text.q38bVocabTopkApprox(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // same tf ranking => same token set; df within the 2% HLL++ target
    // (slack for small-cardinality bias)
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (tok, dfA) =>
      val dfE = exact(tok).toDouble
      assert(math.abs(dfA - dfE) / dfE <= 0.10,
        s"token $tok: approx $dfA vs exact ${exact(tok)}")
    }
  }

  test("q86 BM25 matches the hand formula on a tiny corpus; no-hit docs absent") {
    import spark.implicits._
    val docs = Seq((1L, "spark spark query"), (2L, "hash"),
      (3L, "the end"), (4L, "spark the hash")).toDF("doc_id", "text")
    val rows = operators.Text.bm25From(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!rows.contains(3L), "doc without query terms must be absent")
    // N=4 docs, 9 tokens total; df: spark 2, query 1, hash 2
    def w(tf: Long, df: Long, dl: Long): Double =
      ((4 - df + 0.5) / (df + 0.5)) * (tf * (1.2 + 1.0)) /
        (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl.toDouble * 4 / 9)))
    val expected = Map(
      1L -> (2L, w(2, 2, 3) + w(1, 1, 3)), // spark x2, query x1, dl 3
      2L -> (1L, w(1, 2, 1)), // hash x1, dl 1
      4L -> (2L, w(1, 2, 3) + w(1, 2, 3))) // spark + hash, dl 3
    assert(rows.keySet == expected.keySet)
    expected.foreach { case (id, (hits, score)) =>
      assert(rows(id)._1 == hits, s"doc $id n_hit_terms ${rows(id)._1}")
      assert(math.abs(rows(id)._2 - score) < 1e-12,
        s"doc $id score ${rows(id)._2} != $score")
    }
    val ranked = operators.Text.bm25From(docs).collect().map(_.getDouble(2))
    assert(ranked.sameElements(ranked.sortBy(-(_: Double))), "not ranked")
  }

  test("q39 tf-idf ranks are 1..3 per doc, scores non-increasing") {
    val rows = operators.Text.q39TfidfTopterms(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      val byRk = rs.sortBy(_.getLong(1))
      assert(byRk.map(_.getLong(1)).sameElements(1L to byRk.length))
      val scores = byRk.map(_.getDouble(5))
      assert(scores.sameElements(scores.sortBy(-_)), s"doc $doc scores not ranked")
    }
  }

  test("q48 repetition fractions are in (0,1], top <= dup when dups exist") {
    val rows = operators.Text.q48RepetitionScore(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, top, topF, dup, dupF) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5))
      assert(top >= 1 && top <= n)
      assert(topF > 0.0 && topF <= 1.0)
      assert(dup >= 0 && dup <= n)
      assert(dupF >= 0.0 && dupF <= 1.0)
      // the top bigram's occurrences are part of the duplicated mass
      // whenever it repeats at all
      if (top > 1) assert(dup >= top, s"doc ${r.getLong(0)}: dup $dup < top $top")
      assert(math.abs(topF - top.toDouble / n) < 1e-12)
      assert(math.abs(dupF - dup.toDouble / n) < 1e-12)
    }
  }

  test("q48 flags a degenerate repeated-bigram doc above a varied doc") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q48_docs").toFile
    dir.deleteOnExit()
    Seq(
      (1L, "spam spam spam spam spam spam", "en", "s", 30L),
      (2L, "one two three four five six seven", "en", "s", 33L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir.getAbsolutePath + "/documents.parquet")
    val out = operators.Text.q48RepetitionScore(spark, dir.getAbsolutePath)
    val byId = out.collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(byId(1L) == 1.0, "all-same-bigram doc must have dup_frac 1")
    assert(byId(2L) == 0.0, "all-distinct-bigram doc must have dup_frac 0")
  }

  test("q93 fluency matches hand-computed smoothed bigram LM scores") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q93_docs").toFile
    dir.deleteOnExit()
    // corpus: uni a=2 b=2 x=1 y=1 z=1 (V=5); bigrams "a b"=2 "b a"=1 "x y"=1
    Seq((1L, "a b a b", "en", "s", 7L),
      (2L, "x y", "en", "s", 3L),
      (3L, "z", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir.getAbsolutePath + "/documents.parquet")
    val rows = operators.Text.q93LmFluency(spark, dir.getAbsolutePath)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // "a b": (2+1)e6 div (2+5) = 428571; "b a": (1+1)e6 div 7 = 285714;
    // "x y": (1+1)e6 div (1+5) = 333333
    assert(rows(1L) == ((3L, 2 * 428571L + 285714L, (2 * 428571L + 285714L) / 3)),
      s"doc 1: ${rows(1L)}")
    assert(rows(2L) == ((1L, 333333L, 333333L)), s"doc 2: ${rows(2L)}")
    assert(rows(3L) == ((0L, 0L, 0L)), s"doc 3: ${rows(3L)}")
    // the smoothing contract: the repeated-transition doc outscores the
    // hapax-gibberish doc (unsmoothed self-counts would invert this)
    assert(rows(1L)._3 > rows(2L)._3)
  }

  test("q93 fluency scores stay in [0, 1e6] and cover every doc on sf0.001") {
    val out = operators.Text.q93LmFluency(spark, sf).collect()
    assert(out.length == Tables.documents(spark, sf).count())
    out.foreach { r =>
      val (nb, fs, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ppm >= 0 && ppm <= 1000000L, s"doc ${r.getLong(0)}: ppm $ppm")
      assert(fs <= nb * 1000000L, s"doc ${r.getLong(0)}: sum $fs over bound")
      assert((nb == 0) == (fs == 0))
    }
  }

  test("q49 funnel is monotone non-increasing with the full stage set") {
    val rows = operators.Text.q49CurationPipeline(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq ==
      Seq("0_all", "1_lang", "2_quality", "3_dedup", "4_train"))
    rows.sliding(2).foreach { case Array((s1, (d1, c1)), (s2, (d2, c2))) =>
      assert(d2 <= d1, s"$s2 docs $d2 > $s1 docs $d1")
      assert(c2 <= c1, s"$s2 chars $c2 > $s1 chars $c1")
    }
  }

  test("q49 stages gate correctly on a planted corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q49_docs").toFile
    dir.deleteOnExit()
    // 60-token english text: passes lang (en markers) and quality
    // (length + stopword terms clear the 0.5 bar)
    val good = (("the quick fox of the hill and the dog of " * 6).trim)
    val german = ("der hund die katze und das haus " * 8).trim
    val shortEn = "the of a and in"
    Seq(
      (1L, good, "en", "s", good.length.toLong),      // kept, dedup rep
      (2L, good, "en", "s", good.length.toLong),      // exact dup -> dropped at 3
      (3L, german, "de", "s", german.length.toLong),  // dropped at 1 (lang)
      (4L, shortEn, "en", "s", shortEn.length.toLong)) // dropped at 2 (quality)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir.getAbsolutePath + "/documents.parquet")
    val rows = operators.Text.q49CurationPipeline(spark, dir.getAbsolutePath)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("0_all") == 4L)
    assert(rows("1_lang") == 3L, s"lang gate: $rows")
    assert(rows("2_quality") == 2L, s"quality gate: $rows")
    assert(rows("3_dedup") == 1L, s"dedup gate: $rows")
    assert(rows("4_train") <= 1L)
  }

  test("q65 histogram buckets partition the corpus with monotone cumulative") {
    val total = Tables.documents(spark, sf).count()
    val rows = operators.Text.q65LengthHistogram(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 64 == 0, "bucket not 64-aligned")
      assert(r.getLong(1) > 0, "empty bucket emitted")
    }
    val cums = rows.map(_.getLong(3))
    assert(cums.sameElements(cums.sorted), "cumulative not monotone")
    assert(rows.map(_.getLong(1)).sum == total, "buckets do not partition corpus")
    assert(cums.last == total, "last cumulative != corpus size")
  }

  test("q47 stratified sample keeps every stratum, en downsampled hardest") {
    val rows = operators.Text.q47StratifiedSample(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet.contains("en"))
    rows.foreach { case (lang, (total, kept)) =>
      assert(kept <= total, s"$lang kept > total")
      assert(kept > 0, s"$lang sampled to zero")
    }
    // en keeps ~25%, others ~75%: en's keep fraction must be the lowest
    val fracs = rows.map { case (l, (t, k)) => l -> k.toDouble / t }
    assert(fracs("en") == fracs.values.min,
      s"en not the most downsampled: $fracs")
  }

  test("q68 two-phase prefix sum equals the single-partition global window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val got = operators.Text.q68SequencePack(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // reference: the shape q68 exists to avoid — one global ordered window
    val bpe = regexp_count(lower(col("text")),
      lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("long")
    val w = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = Tables.documents(spark, sf)
      .select(col("doc_id"), bpe.as("n"))
      .filter(col("n") > 0)
      .withColumn("cum", sum(col("n")).over(w))
      .select(col("doc_id"), (col("cum") - col("n")).as("start_off"),
        expr("(cum - n) div 2048").as("sb"), expr("(cum - 1) div 2048").as("eb"))
      .collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(3) - r.getLong(2) + 1)))
      .toMap
    assert(got == ref, "two-phase scan diverged from the global window")
    assert(got.values.exists(_._4 > 1), "no straddling doc — spec is vacuous")
  }
}
