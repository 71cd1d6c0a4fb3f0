package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The segment LIFECYCLE shared by every streamed store in the engine
  * (the lexical index refresh [[IndexRefreshSink]] and the vector
  * index refresh [[AnnRefreshSink]]): immutable per-micro-batch
  * segment directories, a deterministic merged-segment naming scheme,
  * commit via the _SUCCESS marker of each segment's LAST-written
  * artifact, and range-coverage resolution of the live set.
  *
  * The rules, once, for both stores:
  *
  *  - a BASE segment `seg_<batchId>` spans [batchId, batchId]; a
  *    MERGED segment `seg_m<lo>_<hi>` spans [lo, hi];
  *  - a segment is COMMITTED iff its commit artifact's _SUCCESS
  *    exists (the caller names which artifact is written last);
  *  - a committed segment is LIVE unless a committed merged segment
  *    STRICTLY covers its range — so a crashed half-merge is
  *    invisible, folded inputs are garbage (not double reads), and a
  *    merge re-run overwrites the same deterministic target;
  *  - a replayed batch id inside a committed merged range must be
  *    SKIPPED by the appender (Overwrite idempotence cannot help once
  *    the base segment's rows live inside a merged segment).
  */
object Segments {

  def segName(batchId: Long): String = s"seg_$batchId"
  def mergedSegName(lo: Long, hi: Long): String = s"seg_m${lo}_$hi"

  /** One segment's identity: directory name + the batch-id range it
    * holds. */
  case class Seg(name: String, lo: Long, hi: Long, merged: Boolean)

  private val BaseRe = """seg_(\d+)""".r
  private val MergedRe = """seg_m(\d+)_(\d+)""".r
  def parseSeg(name: String): Option[Seg] = name match {
    case BaseRe(id) => Some(Seg(name, id.toLong, id.toLong, merged = false))
    case MergedRe(lo, hi) => Some(Seg(name, lo.toLong, hi.toLong, merged = true))
    case _ => None
  }

  def fs(s: SparkSession, p: String): FileSystem =
    FileSystem.get(new Path(p).toUri, s.sparkContext.hadoopConfiguration)

  /** Committed segments under `path`: those whose commit artifact (the
    * caller's `commitDir(segName)` — the LAST dir its writer produces)
    * carries _SUCCESS. Driver-side listing bounded by segment count. */
  def committedSegs(s: SparkSession, path: String,
      commitDir: String => String): Seq[Seg] = {
    val f = fs(s, path)
    val root = new Path(path)
    if (!f.exists(root)) return Nil
    f.listStatus(root).toSeq.filter(_.isDirectory)
      .flatMap(st => parseSeg(st.getPath.getName))
      .filter(sg => f.exists(new Path(s"${commitDir(sg.name)}/_SUCCESS")))
  }

  /** The PURE live-set resolution: committed minus strictly-covered.
    * Exactly-once serving rests on one structural invariant the
    * merge API maintains — merged ranges are NESTED (every merge folds
    * ALL live segments, so each new range contains every previously
    * committed merged range it overlaps). Under nesting, each batch id
    * is served by exactly one live segment (property-tested in
    * SegmentsSpec); partially overlapping merged ranges can only arise
    * from hand-written segment dirs, never from [[IndexRefreshSink]] /
    * [[AnnRefreshSink]]. */
  def resolveLive(committed: Seq[Seg]): Seq[Seg] =
    committed.filterNot(sg => committed.exists(o => o.merged &&
      o.lo <= sg.lo && sg.hi <= o.hi && (o.lo < sg.lo || sg.hi < o.hi)))
      .sortBy(_.lo)

  /** Committed minus strictly-covered — what a reader serves from. */
  def liveSegments(s: SparkSession, path: String,
      commitDir: String => String): Seq[Seg] =
    resolveLive(committedSegs(s, path, commitDir))

  /** Is `batchId` already folded into a committed merged segment? */
  def mergeCovered(s: SparkSession, path: String,
      commitDir: String => String, batchId: Long): Boolean =
    committedSegs(s, path, commitDir)
      .exists(sg => sg.merged && sg.lo <= batchId && batchId <= sg.hi)

  /** The shared OPTIMIZE skeleton both segmented stores run: fold every
    * live segment into one `seg_m<lo>_<hi>` — size the output from the
    * folded segments' file LISTING (metadata only), rewrite through the
    * caller's `recluster(df, nFiles)` (the only store-specific plan
    * step), then let `commitArtifacts(segName, live)` derive the new
    * segment's manifest/stats and write the COMMIT artifact last. One
    * implementation of the sizing, naming and ordering rules, so the
    * two stores' merge semantics cannot drift. Returns the merged
    * segment name, or None when fewer than two segments are live. */
  def mergeSegments(s: SparkSession, path: String,
      commitDir: String => String, targetFileBytes: Long)(
      recluster: (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame,
      commitArtifacts: (String, Seq[Seg]) => Unit): Option[String] =
    graft.sources.WriterLease.withLease(s, path, "mergeSegments") {
    val live = liveSegments(s, path, commitDir)
    if (live.size < 2) return None
    val seg = mergedSegName(live.map(_.lo).min, live.map(_.hi).max)
    val f = fs(s, path)
    val bytes = live.map { sg =>
      f.listStatus(new Path(s"$path/${sg.name}"))
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(_.getLen).sum
    }.sum
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    // The long write goes to a TEMP name parseSeg rejects, then one
    // atomic-ish rename claims the deterministic target just before the
    // commit artifact: a vacuum scanning mid-merge sees no uncommitted
    // seg_m dir to reclaim (advice finding — the old in-place write left
    // the whole merge window exposed), and a crashed attempt leaves only
    // a .tmp_ dir the retry Overwrites / [[vacuum]] reclaims once a
    // wider merge commits past it.
    val tmp = tmpMergeDir(path, seg)
    recluster(s.read.parquet(live.map(sg => s"$path/${sg.name}"): _*), n)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp)
    val target = new Path(s"$path/$seg")
    f.delete(target, true) // a crash-between-rename-and-commit leftover
    require(graft.sources.StoreIo.ops.rename(f, new Path(tmp), target),
      s"merge staging rename failed: $tmp -> $target")
    commitArtifacts(seg, live)
    Some(seg)
  }

  /** Where [[mergeSegments]] stages its output before the commit-point
    * rename — a dot-name so segment listing (parseSeg) and parquet
    * readers both ignore it. */
  private def tmpMergeDir(path: String, seg: String): String =
    s"$path/.tmp_$seg"

  /** Physically delete segments folded into a committed merged segment
    * (reclamation only — the coverage rule already hides them), plus
    * UNCOMMITTED merged-segment leftovers: a crashed merge writes data
    * under its deterministic seg_m target but never the commit
    * artifact, and once a LATER merge commits a wider target that
    * orphan name is never claimed again — without this rule it leaks
    * disk forever (it is never served either way). An uncommitted
    * merged dir is garbage BY DEFINITION under the commit rule, so
    * vacuum may always reclaim it — under the store family's
    * single-maintainer discipline (merge and vacuum run from one
    * maintenance schedule, as IndexRefreshSink/AnnRefreshSink drive
    * them), never racing an in-flight merge that is writing that very
    * dir. The caller lists every directory a segment owns. */
  def vacuum(s: SparkSession, path: String, commitDir: String => String,
      segDirs: String => Seq[String]): Unit =
    graft.sources.WriterLease.withLease(s, path, "segmentVacuum") {
    val f = fs(s, path)
    val root = new Path(path)
    if (!f.exists(root)) return
    val all = f.listStatus(root).toSeq.filter(_.isDirectory)
      .flatMap(st => parseSeg(st.getPath.getName))
    val committed = all.filter(sg =>
      f.exists(new Path(s"${commitDir(sg.name)}/_SUCCESS")))
    val committedNames = committed.map(_.name).toSet
    val covered = committed.filter(sg => committed.exists(o => o.merged &&
      o.lo <= sg.lo && sg.hi <= o.hi && (o.lo < sg.lo || sg.hi < o.hi)))
    val orphanMerged = all.filter(sg => sg.merged &&
      !committedNames.contains(sg.name))
    (covered ++ orphanMerged).foreach(sg =>
      segDirs(sg.name).foreach(d => f.delete(new Path(d), true)))
    // Crashed merge STAGING dirs (.tmp_seg_m*): reclaim only once a
    // committed merged segment covers the tmp's whole range — proof the
    // attempt that wrote it is dead (its live set has been folded past),
    // never a dir an in-flight merge could still be writing.
    f.listStatus(root).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith(".tmp_"))
      .flatMap(n => parseSeg(n.stripPrefix(".tmp_")).map(n -> _))
      .filter { case (_, sg) => committed.exists(o => o.merged &&
        o.lo <= sg.lo && sg.hi <= o.hi) }
      .foreach { case (n, _) => f.delete(new Path(s"$path/$n"), true) }
  }
}
