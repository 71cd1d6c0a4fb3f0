package graft

import graft.streaming.Segments
import graft.streaming.Segments.Seg
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The segment lifecycle's exactly-once law, checked as a pure
  * property: simulate any append/merge history the sinks can produce
  * (merges always fold ALL live segments, so merged ranges are nested
  * by construction), and assert that the live-set resolution serves
  * every appended batch id through EXACTLY ONE live segment — the
  * invariant that makes a probe's segment union exact and a folded
  * batch's replay skippable. */
class SegmentsSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  test("parseSeg: base/merged round-trip; junk rejected") {
    assert(Segments.parseSeg("seg_7").contains(Seg("seg_7", 7, 7, merged = false)))
    assert(Segments.parseSeg("seg_m2_9").contains(Seg("seg_m2_9", 2, 9, merged = true)))
    assert(Segments.parseSeg(Segments.segName(42)).exists(s => s.lo == 42 && s.hi == 42))
    assert(Segments.parseSeg(Segments.mergedSegName(3, 11))
      .exists(s => s.lo == 3 && s.hi == 11 && s.merged))
    Seq("seg_", "seg_m3", "seg_x1", "_tmp", "seg_m_4", "seg_3_4").foreach(n =>
      assert(Segments.parseSeg(n).isEmpty, s"junk accepted: $n"))
  }

  test("any sink-producible history serves every batch id exactly once") {
    // ops: a sequence of batch appends interleaved with merge points
    val historyGen = for {
      n <- Gen.chooseNum(1, 30)             // total appended batches
      mergesAt <- Gen.someOf(1 until n)     // merge after these batch counts
    } yield (n, mergesAt.toSet)
    check(Prop.forAll(historyGen) { case (n, mergesAt) =>
      // replay the API's behavior: appends create base segs; a merge
      // folds the CURRENT live set into one spanning seg (all segments
      // stay committed until vacuum — resolution must be exact even
      // with the garbage present)
      var committed = Vector.empty[Seg]
      (0 until n).foreach { b =>
        committed :+= Seg(Segments.segName(b.toLong), b.toLong, b.toLong, merged = false)
        if (mergesAt.contains(b + 1)) {
          val live = Segments.resolveLive(committed)
          if (live.size >= 2) {
            val (lo, hi) = (live.map(_.lo).min, live.map(_.hi).max)
            committed :+= Seg(Segments.mergedSegName(lo, hi), lo, hi, merged = true)
          }
        }
      }
      val live = Segments.resolveLive(committed)
      // exactly-once: each appended batch id falls in the range of
      // EXACTLY one live segment
      val coverage = (0 until n).map(b =>
        live.count(sg => sg.lo <= b && b <= sg.hi))
      val exactlyOnce = coverage.forall(_ == 1)
      // and replay-skip agrees with serving: an id inside a committed
      // merged range is never served by its base segment
      val replaySafe = (0 until n).forall { b =>
        val folded = committed.exists(sg => sg.merged &&
          sg.lo <= b && b <= sg.hi)
        val servedByBase = live.exists(sg => !sg.merged && sg.lo == b.toLong)
        !(folded && servedByBase)
      }
      exactlyOnce && replaySafe
    })
  }

  test("vacuum reclaims covered segments AND crashed-merge orphans") {
    import TestSpark.spark
    val path = java.nio.file.Files.createTempDirectory("graft_segvac_").toString
    val commitDir = (name: String) => s"$path/commits/$name"
    def mk(name: String, committed: Boolean): Unit = {
      val d = new java.io.File(s"$path/$name"); d.mkdirs()
      java.nio.file.Files.write(new java.io.File(d, "part.parquet").toPath,
        "x".getBytes)
      if (committed) {
        val c = new java.io.File(commitDir(name)); c.mkdirs()
        java.nio.file.Files.write(new java.io.File(c, "_SUCCESS").toPath,
          Array.empty[Byte])
      }
    }
    mk("seg_0", committed = true)
    mk("seg_1", committed = true)
    mk("seg_2", committed = true)
    // a crashed merge: data dir written, commit artifact never landed.
    // a later merge then committed the WIDER deterministic target, so
    // seg_m0_1's name is never claimed again — the permanent-leak case
    mk("seg_m0_1", committed = false)
    mk("seg_m0_2", committed = true)
    // before vacuum: resolution already hides everything but the merge
    val live = Segments.liveSegments(spark, path, commitDir)
    assert(live.map(_.name) == Seq("seg_m0_2"))
    Segments.vacuum(spark, path, commitDir,
      seg => Seq(s"$path/$seg", commitDir(seg)))
    val left = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("seg")).sorted.toSeq
    assert(left == Seq("seg_m0_2"),
      s"vacuum left $left — covered bases and the orphan must both go")
    // serving is untouched, and vacuum is idempotent
    assert(Segments.liveSegments(spark, path, commitDir)
      .map(_.name) == Seq("seg_m0_2"))
    Segments.vacuum(spark, path, commitDir,
      seg => Seq(s"$path/$seg", commitDir(seg)))
    assert(new java.io.File(s"$path/seg_m0_2").exists())
  }
}
