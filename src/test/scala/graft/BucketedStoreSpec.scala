package graft

import graft.sources.BucketedStore
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class BucketedStoreSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  // AQE query stages are leaf nodes — plain collect() stops at them and
  // would make every plan assertion vacuously pass. Flatten through them.
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
    case q: QueryStageExec => p +: flatten(q.plan)
    case _ => p +: p.children.flatMap(flatten)
  }

  test("bucketed fact-fact join runs with zero shuffle exchanges") {
    val j = BucketedStore.colocatedJoin(spark, sf)
      .select(col("o_orderkey"), col("l_quantity"))
    // execute so AQE finalizes the plan we inspect
    val n = j.collect().length
    val expected = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .count()
    assert(n.toLong == expected, "bucketed join result differs from plain join")

    val nodes = flatten(j.queryExecution.executedPlan)
    val shuffles = nodes.collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.isEmpty,
      s"expected shuffle-free co-located join, found: ${shuffles.map(_.nodeName)}")
    // and it is a genuine sort-merge join off the bucketed scans, not a
    // broadcast that would trivially avoid the exchange
    assert(nodes.exists(_.isInstanceOf[SortMergeJoinExec]),
      s"expected SortMergeJoin in:\n${j.queryExecution.executedPlan}")
  }

  test("q28 rollup over the bucketed join shuffles only for the final groupBy") {
    val df = BucketedStore.q28BucketedJoin(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val nodes = flatten(df.queryExecution.executedPlan)
    val shuffles = nodes.collect { case e: ShuffleExchangeLike => e }
    // distinct-count + groupBy + presentation sort may each exchange the
    // tiny aggregated relation; the join stage itself must not re-shuffle
    // the bucketed facts on the join key
    assert(shuffles.size <= 3,
      s"too many exchanges: ${shuffles.map(_.nodeName)}")
    assert(shuffles.forall(e =>
      !e.outputPartitioning.toString.contains("l_orderkey")),
      s"join key shuffle present: ${shuffles.map(_.outputPartitioning)}")
    assert(nodes.exists(_.isInstanceOf[SortMergeJoinExec]),
      "expected SortMergeJoin over bucketed scans")
  }

  test("orphan store namespaces of dead JVMs are swept; live ones survive") {
    // the shutdown hook cannot fire on a SIGKILLed suite — the next JVM's
    // sweep is what keeps tmpfs clean after an aborted run
    val scratch = new java.io.File(Engine.scratchRoot)
    // a pid that cannot be alive: pid_max on Linux tops out at 2^22.
    // writeOwnerMarker stamps it with OUR pid-namespace id — the marker a
    // same-container SIGKILLed JVM would have left behind.
    val dead = new java.io.File(scratch, "graft-stores-999999999")
    Engine.writeOwnerMarker(dead)
    val inner = new java.io.File(dead, "bucketed/abc")
    assert(inner.mkdirs() || inner.isDirectory)
    // a dead pid from a FOREIGN pid namespace (marker mismatch): on a
    // shared /dev/shm mount this could be another container's LIVE JVM
    // whose pid merely looks dead from here — must survive
    val foreign = new java.io.File(scratch, "graft-stores-999999998")
    foreign.mkdirs()
    java.nio.file.Files.write(foreign.toPath.resolve(".graft-owner-pidns"),
      "pid:[0000000000]".getBytes)
    // a dead pid with NO marker (partially created / unknown origin):
    // ownership unprovable, must survive
    val unmarked = new java.io.File(scratch, "graft-stores-999999997")
    unmarked.mkdirs()
    // our own namespace (live pid) must survive the sweep
    val mine = new java.io.File(scratch,
      s"graft-stores-${ProcessHandle.current().pid()}")
    mine.mkdirs()
    // non-store siblings are out of scope entirely
    val other = new java.io.File(scratch, "graft-unrelated-999999999")
    other.mkdirs()
    try {
      Engine.sweepOrphanStores()
      assert(!dead.exists(), "dead same-namespace store namespace not swept")
      assert(foreign.exists(), "foreign-namespace store tree was swept")
      assert(unmarked.exists(), "unmarked store tree was swept")
      assert(mine.exists(), "live JVM's own namespace was swept")
      assert(other.exists(), "sweep touched a non-store directory")
    } finally {
      Seq(other, dead).foreach(_.delete())
      Seq(foreign, unmarked).foreach { d =>
        d.toPath.resolve(".graft-owner-pidns").toFile.delete(); d.delete()
      }
    }
  }
}
