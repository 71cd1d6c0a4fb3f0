package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Bounded LRU cache of persisted intermediate frames, keyed by
  * (session, tag, canonicalized input plan).
  *
  * Why this exists: the dedup/ANN family builds expensive multi-consumer
  * intermediates (digest groups, shingle indexes, decoded embeddings)
  * that must be persisted — but a bare `.persist()` inside a query
  * builder registers a NEW cache entry per call, so a long-lived session
  * running the same queries repeatedly accumulates storage without
  * bound (the round-7 vecCache fixed this for ONE frame; this is the
  * same pattern for all of them, with the bound the vecCache lacked).
  *
  * Contracts:
  *  - Same key => same persisted DataFrame object, so N calls hold ONE
  *    cache entry (no growth across repeated runs — spec-asserted via
  *    `getPersistentRDDs` in DedupSpec).
  *  - If a harness cleared the session cache between calls
  *    (`spark.catalog.clearCache()` — graft.Bench does, per query), the
  *    frame re-persists on next use.
  *  - Entries of stopped sessions are dropped on every access.
  *  - At most [[MaxEntries]] live entries: the least-recently-used entry
  *    is unpersisted and evicted on overflow, so even a session touching
  *    many distinct dirs (or many distinct derived plans) holds bounded
  *    storage. Eviction mid-query is safe — unpersist only drops the
  *    cached blocks, the plan recomputes.
  *  - Source data under a cached dir is assumed IMMUTABLE for the life
  *    of the session (the standard Spark cache contract: a rewritten
  *    parquet dir serves stale cached data until `clearCache()` or
  *    session close — same as `df.cache` anywhere else).
  */
object FrameCache {

  private val MaxEntries = 64

  private final case class Key(session: SparkSession, tag: String, plan: Any)

  private val cache = new java.util.LinkedHashMap[Key, DataFrame](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[Key, DataFrame]): Boolean = {
      val over = size() > MaxEntries
      if (over) safeUnpersist(e.getKey.session, e.getValue)
      over
    }
  }

  private def safeUnpersist(s: SparkSession, df: DataFrame): Unit =
    try { if (!s.sparkContext.isStopped) df.unpersist(false) }
    catch { case _: Exception => () }

  private def evictStopped(): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      if (it.next().getKey.session.sparkContext.isStopped) it.remove()
    }
  }

  /** The persisted frame for `tag` in session `s`, building it once.
    * Use for intermediates that are pure functions of (session, tag) —
    * the tag must encode every input (e.g. the source dir). */
  def persisted(s: SparkSession, tag: String)(build: => DataFrame): DataFrame =
    get(Key(s, tag, ()), build)

  /** The persisted frame derived from input frame `in` by `tag`, keyed
    * by `in`'s canonicalized logical plan — two calls with semantically
    * equal inputs share one entry; a genuinely different input builds
    * its own. */
  def persistedFor(in: DataFrame, tag: String)(build: => DataFrame): DataFrame =
    get(Key(in.sparkSession, tag, in.queryExecution.logical.canonicalized), build)

  /** A frame whose analyzed plan reads only driver-resident leaves
    * (LocalRelation from a collected result, LogicalRDD from a
    * localCheckpoint, Range): re-executing it cannot touch any OTHER
    * cached frame, so after a harness clearCache it is safe — and
    * cheap — to re-persist the memoized object in place. Everything
    * else (plans over file scans / joins) may reference NESTED cached
    * entries once materialized and must rebuild instead (below). */
  private def selfContained(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Range => LRange}
    val leaves = df.queryExecution.analyzed.collectLeaves()
    leaves.nonEmpty && leaves.forall {
      case _: LocalRelation => true
      case _: org.apache.spark.sql.execution.LogicalRDD => true
      case _: LRange => true
      case _ => false
    }
  }

  private def get(key: Key, build: => DataFrame): DataFrame =
    cache.synchronized {
      evictStopped()
      val hit = cache.get(key)
      if (hit != null && hit.storageLevel != StorageLevel.NONE) hit
      else if (hit != null && selfContained(hit)) {
        // harness-side clearCache emptied the storage of a frame whose
        // data lives in the DRIVER (e.g. the k-row BPE merge table):
        // re-persisting the same object restores the documented
        // build-once-per-JVM amortization at re-registration cost only
        hit.persist(StorageLevel.MEMORY_AND_DISK)
        hit
      } else {
        // miss, OR clearCache emptied a COMPOSITE entry's storage. In
        // the cleared case the memoized Dataset must be REBUILT, not
        // just re-persisted: its executed plan was compiled against the
        // now-cleared InMemoryRelations of any NESTED cached frames
        // (e.g. the band relation inside the pair frame), and
        // re-registering those frames in the CacheManager cannot reach
        // a plan that is already memoized — the entry would evaluate
        // with every nested cache COLD, multiplying the pipeline cost
        // per materialization (measured: q45 49 s vs 3 s at 10x, the
        // band self-join recomputing the whole signature pipeline per
        // side per pass). Rebuilding re-runs the builder, which
        // re-enters persisted() for each nested entry (reentrant lock,
        // same rule applies recursively), so the fresh plan is compiled
        // against LIVE cache registrations. Build cost is plan
        // construction only — no materialization happens here.
        val built = build
        if (built.storageLevel == StorageLevel.NONE)
          built.persist(StorageLevel.MEMORY_AND_DISK)
        cache.put(key, built)
        built
      }
    }

  /** Live entry count (spec hook). */
  private[graft] def size: Int = cache.synchronized { evictStopped(); cache.size() }

  /** Live entry tags (spec/debug hook). */
  private[graft] def tags: Seq[String] = cache.synchronized {
    import scala.jdk.CollectionConverters._
    cache.keySet().asScala.toSeq.map(_.tag)
  }
}
