package graft

import graft.sources.{AnnIndexStore, InvertedIndexStore}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted ANN index's contract — the vector twin of
  * InvertedIndexStoreSpec:
  *
  *  - q51b serves BIT-IDENTICAL results to q51's in-memory LSH tier
  *    (same hyperplanes + Hamming ball ⇒ same candidate set, same
  *    exact-cosine rescore) while reading only manifest-selected code
  *    files with the bucket predicate pushed into the scan;
  *  - q92b obeys the q92 IVF laws ON THE PERSISTED STRUCTURE: probe-all
  *    equals the exact scan, recall monotone in nprobe, results only
  *    from probed cells — and opens only the probed cells' files;
  *  - q104b fuses the two persisted serving tiers with the exact q104
  *    integer RRF arithmetic (law-checked per row) over lists that are
  *    provably the store probes' own rankings.
  */
class AnnIndexStoreSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.01"

  test("q51b index probe is bit-identical to q51's in-memory LSH tier") {
    val fromIndex = AnnIndexStore.q51bKnnLshIndex(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val inMemory = operators.Similarity.q51KnnLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromIndex.nonEmpty, "probe returned nothing — vacuous")
    assert(fromIndex == inMemory,
      s"store probe diverged from in-memory LSH:\n  index=$fromIndex\n  mem=$inMemory")
  }

  test("q92b on the persisted cells: probe-all equals exact scan; recall monotone; no cell leak") {
    val exact = operators.Similarity.q50KnnBrute(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val cells = AnnIndexStore.storeCellCount(spark, sf)
    val all = AnnIndexStore.ivfIndex(spark, sf, nprobe = cells, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(all.toSeq == exact.toSeq,
      s"probe-all over the store diverged from exact scan:\n$all\nvs\n$exact")
    val exactIds = exact.map(_._1).toSet
    val byProbe = Seq(1, 2, cells).map { np =>
      val ids = AnnIndexStore.ivfIndex(spark, sf, np, k = 10)
        .collect().map(_.getLong(0)).toSet
      (exactIds & ids).size.toDouble / exactIds.size
    }
    assert(byProbe == byProbe.sorted, s"q92b recall not monotone: $byProbe")
    assert(byProbe.last == 1.0)
    val one = AnnIndexStore.ivfIndex(spark, sf, 1, k = 10).collect()
    assert(one.map(_.getLong(1)).toSet.size <= 1, "nprobe=1 leaked cells")
  }

  test("probes open only manifest-selected files; predicates reach the scan") {
    val path = AnnIndexStore.store(spark, sf)

    // vectors point-fetch: the query's file only
    val vecFilesAll = spark.read.parquet(AnnIndexStore.vectorsPath(path))
      .select(input_file_name()).distinct().count()
    val qFiles = AnnIndexStore.filesForKeys(
      spark, AnnIndexStore.vectorsPath(path), Seq(0L))
    assert(qFiles.nonEmpty && qFiles.length < vecFilesAll,
      s"vector point-fetch pruned nothing: ${qFiles.length} of $vecFilesAll")

    // cells probe: nprobe cells select a strict subset of cell files,
    // and the scan opens exactly those
    val cellFilesAll = spark.read.parquet(AnnIndexStore.cellsPath(path))
      .select(input_file_name()).distinct().count()
    val probed = Seq(0L, 1L)
    val cellFiles = AnnIndexStore.filesForKeys(
      spark, AnnIndexStore.cellsPath(path), probed)
    assert(cellFiles.nonEmpty && cellFiles.length < cellFilesAll,
      s"cell manifest pruned nothing: ${cellFiles.length} of $cellFilesAll")
    val cellProbe = spark.read.parquet(cellFiles: _*)
      .filter(col("cell").isin(probed: _*))
    cellProbe.collect()
    val cellScan = cellProbe.queryExecution.executedPlan.collectFirst {
      case sc: FileSourceScanExec => sc
    }.getOrElse(fail("no FileSourceScanExec"))
    assert(cellScan.metrics("numFiles").value == cellFiles.length)
    assert(cellScan.metadata("PushedFilters").contains("In(cell"),
      s"cell filter not pushed: ${cellScan.metadata("PushedFilters")}")

    // codes probe: single-probe (radius 0) keys are 12 scattered buckets
    // — file skip must engage; the gated radius-2 probe's wider key set
    // then relies on the pushed tc predicate for row-group skip, and
    // must still read a small fraction of the postings
    val bits = operators.Similarity.LshBits
    val qv = AnnIndexStore.fetchVector(spark, path, 0L)
    val qCodes = qv.select(posexplode(
        operators.Similarity.lshCodes(col("e"))).as(Seq("t", "code")))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val r0Keys = qCodes.map { case (t, c) => (t.toLong << bits) | c }.toSeq
    val codeFilesAll = spark.read.parquet(AnnIndexStore.codesPath(path))
      .select(input_file_name()).distinct().count()
    val r0Files = AnnIndexStore.filesForKeys(
      spark, AnnIndexStore.codesPath(path), r0Keys)
    assert(r0Files.nonEmpty && r0Files.length < codeFilesAll,
      s"radius-0 code probe pruned nothing: ${r0Files.length} of $codeFilesAll")
    val masks = operators.Similarity.probeMasks(bits, 2)
    val r2Keys = qCodes.flatMap { case (t, c) =>
      masks.map(m => (t.toLong << bits) | (c ^ m))
    }.toSeq.distinct
    val r2Files = AnnIndexStore.filesForKeys(
      spark, AnnIndexStore.codesPath(path), r2Keys)
    val codeProbe = spark.read.parquet(r2Files: _*)
      .filter(col("tc").isin(r2Keys: _*))
    val matched = codeProbe.count()
    val codeScan = codeProbe.queryExecution.executedPlan.collectFirst {
      case sc: FileSourceScanExec => sc
    }.getOrElse(fail("no FileSourceScanExec"))
    assert(codeScan.metadata("PushedFilters").contains("tc"),
      s"tc filter not pushed: ${codeScan.metadata("PushedFilters")}")
    // candidate volume is a small fraction of the postings — the LSH
    // selectivity that makes the probed read sub-corpus. (At this test
    // scale each file is one row group, so the pushed tc predicate's
    // row-group skip is only observable as the radius-0 file skip
    // above; at production file counts the sorted tc layout skips
    // groups inside every opened file too.)
    val allCodes = spark.read.parquet(AnnIndexStore.codesPath(path)).count()
    assert(matched > 0 && matched < allCodes / 2,
      s"probe matched $matched of $allCodes code rows — no selectivity")
  }

  test("q104b fuses the two persisted serving tiers with the q104 arithmetic") {
    val fused = AnnIndexStore.q104bHybridRrfIndex(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(fused.nonEmpty)
    // integer RRF law per row
    fused.foreach { case (id, lr, vr, score) =>
      val expect = (if (lr > 0) 1000000000L / (60 + lr) else 0L) +
        (if (vr > 0) 1000000000L / (60 + vr) else 0L)
      assert(score == expect, s"doc $id: rrf $score != $expect (lex=$lr vec=$vr)")
      assert(id != 0, "query doc leaked into the fused list")
    }
    // the lexical ranks ARE q86b's ranking (which is itself q86-exact)
    val lexList = InvertedIndexStore.q86bBm25Index(spark, sf)
      .orderBy(col("score").desc, col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    fused.filter(_._2 > 0).foreach { case (id, lr, _, _) =>
      assert(lexList(lr.toInt - 1) == id,
        s"doc $id claims lex rank $lr but q86b has ${lexList(lr.toInt - 1)}")
    }
    // the vector ranks ARE the IVF store probe's ranking
    val vecList = AnnIndexStore.ivfIndex(spark, sf, nprobe = 2, k = 20)
      .collect().map(_.getLong(0)).toSeq
    fused.filter(_._3 > 0).foreach { case (id, _, vr, _) =>
      assert(vecList(vr.toInt - 1) == id,
        s"doc $id claims vec rank $vr but the IVF probe has ${vecList(vr.toInt - 1)}")
    }
    // membership: fused docs come from the two source lists and nowhere else
    val members = (lexList.toSet ++ vecList.toSet) - 0L
    assert(fused.map(_._1).toSet.subsetOf(members), "fused doc outside both lists")
  }

  test("q54b serves the quantized scan bit-identically from the persisted codes") {
    val fromIndex = AnnIndexStore.q54bKnnQuantizedIndex(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val inMemory = operators.Similarity.q54KnnQuantized(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromIndex.nonEmpty && fromIndex == inMemory,
      s"persisted quantized scan diverged:\n  index=$fromIndex\n  mem=$inMemory")
    // the codebook is persisted (a fresh process must quantize QUERIES
    // with the corpus's own affine map) and matches the live derivation
    val path = AnnIndexStore.store(spark, sf)
    val stored = spark.read.parquet(AnnIndexStore.codebookPath(path)).head()
    val live = operators.Similarity.corpusCodebook(
      spark.read.parquet(AnnIndexStore.vectorsPath(path))).head()
    assert(stored.getSeq[Double](0) == live.getSeq[Double](0) &&
      stored.getSeq[Double](1) == live.getSeq[Double](1),
      "persisted codebook drifted from the corpus derivation")
  }

  test("serving API: arbitrary-vector probe and stored-codebook query quantization") {
    val path = AnnIndexStore.store(spark, sf)
    val all = spark.read.parquet(AnnIndexStore.vectorsPath(path))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val qe = all.find(_._1 == 7L).get._2
    // probe-all with a caller-supplied query ≡ the exact scan computed
    // off-engine (the serving path takes the REQUEST's embedding; the
    // gated q92b is this probe pointed at vec 0)
    val cells = AnnIndexStore.storeCellCount(spark, sf)
    val got = AnnIndexStore.ivfProbeVector(spark, path, qe,
      nprobe = cells, k = 5, excludeId = Some(7L))
      .collect().map(_.getLong(0)).toSeq
    val qn = math.sqrt(qe.map(x => x * x).sum)
    val exp = all.filterNot(_._1 == 7L).map { case (id, e) =>
      val c = e.zip(qe).map { case (a, b) => a * b }.sum /
        (math.sqrt(e.map(x => x * x).sum) * qn)
      (id, c)
    }.sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSeq
    assert(got == exp, s"serving probe diverged: $got vs $exp")

    // quantizing a raw query through the STORED codebook reproduces the
    // store's own code for that vector — queries and corpus share one
    // affine map by construction
    val rawQ = AnnIndexStore.quantizeQuery(spark, path, qe).toSeq
    val storedQ = spark.read.parquet(AnnIndexStore.quantPath(path))
      .filter(org.apache.spark.sql.functions.col("vec_id") === 7L)
      .head().getSeq[Long](1).toSeq
    assert(rawQ == storedQ, "query quantization drifted from the stored codes")
  }

  test("q106b: serving-tier eval obeys the recall laws (probe-all perfect, monotone)") {
    val cells = AnnIndexStore.storeCellCount(spark, sf)
    // probe-all searches every cell — recall@10 must be 10^6 ppm for
    // EVERY sampled query (the candidate set is the whole corpus)
    val full = AnnIndexStore.retrievalEvalIvf(spark, sf, modulus = 31,
      nprobe = cells).collect()
    assert(full.nonEmpty)
    full.foreach(r => assert(r.getLong(2) == 1000000L,
      s"query ${r.getLong(0)} recall ${r.getLong(2)} at probe-all"))
    // nested probed cells per query -> mean recall monotone in nprobe
    val means = Seq(1, 2, cells).map { np =>
      val rows = AnnIndexStore.retrievalEvalIvf(spark, sf, 31, np).collect()
      rows.map(_.getLong(2)).sum.toDouble / rows.length
    }
    assert(means == means.sorted, s"mean recall not monotone: $means")
  }

  test("cluster-side cell ranking matches the driver rule exactly") {
    // q106b ranks cells for the whole sample CLUSTER-side (no driver
    // collect of sample vectors); the distance fold and tie rule must
    // agree with rankCells — the ONE ranking rule the store family
    // shares — for every sampled query, bit for bit
    val path = AnnIndexStore.store(spark, sf)
    val cents = spark.read.parquet(AnnIndexStore.centroidsPath(path))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).toSeq
    val samp = spark.read.parquet(AnnIndexStore.vectorsPath(path))
      .filter(org.apache.spark.sql.functions.col("vec_id") % 31 === 0)
      .select(org.apache.spark.sql.functions.col("vec_id").as("qid"),
        org.apache.spark.sql.functions.col("e").as("qe"))
    for (np <- Seq(1, 2, cents.size)) {
      val clusterSide = AnnIndexStore.rankCellsDf(spark, path, samp, np)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val driverSide = samp.collect().map { r =>
        r.getLong(0) ->
          AnnIndexStore.rankCells(cents, r.getSeq[Double](1).toArray, np).toSet
      }.toMap
      assert(clusterSide == driverSide, s"nprobe=$np ranking diverged")
    }
  }

  test("quantizeQuery clamps out-of-corpus-range queries onto the u8 map") {
    val path = AnnIndexStore.store(spark, sf)
    val cb = spark.read.parquet(AnnIndexStore.codebookPath(path)).head()
    val (mn, mx) = (cb.getSeq[Double](0), cb.getSeq[Double](1))
    // a query far below/above the corpus extremes must hit the clamped
    // ends of the affine map, never escape [0, 255]
    val below = mn.indices.map(i => mn(i) - 10.0 * (mx(i) - mn(i) + 1)).toArray
    val above = mn.indices.map(i => mx(i) + 10.0 * (mx(i) - mn(i) + 1)).toArray
    assert(AnnIndexStore.quantizeQuery(spark, path, below).forall(_ == 0L))
    assert(AnnIndexStore.quantizeQuery(spark, path, above).forall(_ == 255L))
  }

  test("cell-count rule scales cells with the corpus, never cell size") {
    assert(AnnIndexStore.cellCount(100) == 8, "floor holds at tiny corpora")
    assert(AnnIndexStore.cellCount(1500) == 8, "gated scale keeps q92's k = 8")
    assert(AnnIndexStore.cellCount(24000) == 120)
    val big = AnnIndexStore.cellCount(2400000)
    assert(big == 12000 && 2400000 / big <= AnnIndexStore.TargetCellRows,
      "cell size must stay bounded as the corpus grows")
  }
}
