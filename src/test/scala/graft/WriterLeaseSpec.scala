package graft

import graft.sources.{VersionedStore, WriterLease}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Single-writer enforcement: the maintenance lease must make a second
  * concurrent maintainer FAIL FAST (the round-11 verdict's order — a
  * comment is not a contract), break cleanly on expiry, and gate every
  * maintenance entry point. */
class WriterLeaseSpec extends AnyFunSuite {
  import TestSpark.spark

  test("a second acquirer fails fast while the lease is live, succeeds after release") {
    val store = Files.createTempDirectory("graft_lease_").toString + "/store"
    val l1 = WriterLease.acquire(spark, store, "maintainer-a")
    val e = intercept[IllegalStateException] {
      WriterLease.acquire(spark, store, "maintainer-b")
    }
    assert(e.getMessage.contains("maintainer-a"), e.getMessage)
    l1.release()
    val l2 = WriterLease.acquire(spark, store, "maintainer-b")
    l2.release()
  }

  test("an expired lease is broken and re-claimed, not a deadlock") {
    val store = Files.createTempDirectory("graft_lease_").toString + "/store"
    WriterLease.acquire(spark, store, "dead-maintainer", ttlMs = 1L)
    Thread.sleep(5) // let it expire; the holder never releases (crashed)
    val l = WriterLease.acquire(spark, store, "successor")
    l.release()
  }

  test("a superseded holder's release leaves the successor's lease intact") {
    // A overran its TTL; B broke the expired lease and is live. A's
    // release must NOT delete B's lease (ownership is token-checked),
    // so a third maintainer still fails fast against B.
    val store = Files.createTempDirectory("graft_lease_").toString + "/store"
    val a = WriterLease.acquire(spark, store, "overrunner", ttlMs = 1L)
    Thread.sleep(5)
    val b = WriterLease.acquire(spark, store, "successor")
    a.release() // stale release: token mismatch, must be a no-op
    val e = intercept[IllegalStateException] {
      WriterLease.acquire(spark, store, "third")
    }
    assert(e.getMessage.contains("successor"), e.getMessage)
    b.release()
    WriterLease.acquire(spark, store, "third").release() // now free
  }

  test("maintenance entry points fail fast under a concurrent holder") {
    val store = Files.createTempDirectory("graft_lease_").toString + "/store"
    val held = WriterLease.acquire(spark, store, "live-compactor")
    // VersionedStore maintenance
    intercept[IllegalStateException] {
      VersionedStore.vacuum(spark, store, keepVersions = 1)
    }
    intercept[IllegalStateException] {
      VersionedStore.compactCommit(spark, store, "k", 1L << 20)
    }
    // Segment maintenance (shared by the index-refresh sinks)
    intercept[IllegalStateException] {
      graft.streaming.Segments.vacuum(spark, store, n => s"$store/$n",
        n => Seq(s"$store/$n"))
    }
    held.release()
    // released: the same calls now pass the lease gate (and fail — or
    // no-op — on their own store preconditions instead)
    assert(VersionedStore.vacuum(spark, store, keepVersions = 1) == ((0, 0)))
    graft.streaming.Segments.vacuum(spark, store, n => s"$store/$n",
      n => Seq(s"$store/$n"))
  }
}
