package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Per-round benchmark: one warm-up pass (absorbs JVM/codegen/scan
  * warm-up), then one timed pass per query driven by a noop write (pays
  * full result production, unlike count() which can skip final work).
  * Emits ONE bare JSON line on stdout (build.sbt sets StdoutOutput so sbt
  * does not prefix it) and also writes it to bench_out.json.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val localDir = Engine.localScratchDir
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // Keep shuffle parallelism on small inputs (scale-neutral floor;
      // rationale + measurements on Engine.aqeMinPartitionSize)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        Engine.aqeMinPartitionSize)
      .config("spark.ui.enabled", "false")
    val spark = localDir.fold(builder)(d => builder.config("spark.local.dir", d))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Cache hygiene: several operators persist multi-pass intermediates;
    // dropping them between queries keeps measurements independent (no
    // cross-query cache reuse from the warm-up pass) and prevents cache
    // pressure from skewing later queries in the run.
    def runOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      spark.catalog.clearCache()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    // Optional subset for local iteration: SPARK_GRAFT_QUERIES=q42,q52.
    // Unknown names are loud — a typo'd subset must not record an empty
    // bench JSON that reads as a (very fast) successful run.
    val selected = sys.env.get("SPARK_GRAFT_QUERIES") match {
      case Some(list) =>
        val keep = list.split(",").map(_.trim).filter(_.nonEmpty).toSet
        val unknown = keep -- SparkEntry.queries.keySet
        require(unknown.isEmpty,
          s"SPARK_GRAFT_QUERIES names not in SparkEntry.queries: ${unknown.mkString(", ")}")
        SparkEntry.queries.filter { case (k, _) => keep(k) }
      case None => SparkEntry.queries
    }
    // A query that throws must not read as a normal (fast) timing — it is
    // timed anyway but also listed under "errors" so a regression can't
    // masquerade as a speedup in the recorded bench.
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    // Best-of-N timing (default 3, min reported): pass 1 doubles as the
    // JIT/scan warm-up (the min discards it), and the per-query minimum
    // is the number least contaminated by co-tenant noise on this shared
    // host while still paying every real cost (cache is cleared before
    // each pass, so every pass rebuilds its own persisted intermediates).
    // Floor of 2: a SINGLE timed pass on this shared host has repeatedly
    // recorded disjoint 2-12x co-tenant spikes as per-query "regressions"
    // (adjudicated rounds 3, 7, 8 — the intersection of flagged rows
    // across reruns was empty every time). min-of-2 filters the spike at
    // ~+70s suite cost; an explicit SPARK_GRAFT_PASSES=1 is promoted.
    val passes = math.max(2, sys.env.get("SPARK_GRAFT_PASSES")
      .flatMap(_.toIntOption).getOrElse(3))
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val best = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        try runOne(fn) catch { case e: Throwable =>
          if (!errors.contains(name)) errors += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }.min
      name -> best
    }
    // The driver parses the JSON line out of a bounded stdout tail
    // (~2000 chars, shared with sbt's success footer): full-precision
    // values overflowed it once the suite passed ~60 queries, so the
    // stdout line uses compact centisecond-level numbers (ample for a
    // 2x-of-baseline gate) and omits the empty errors list; bench_out
    // .json keeps full precision for local diffing.
    // Locale.ROOT: the default locale could render a comma decimal
    // separator and corrupt the JSON (raw Double.toString, used for the
    // file copy, is locale-independent already).
    def fmt(dec: Int)(v: Double): String = {
      val s = String.format(java.util.Locale.ROOT,
        s"%.${if (v >= 10) 1 else dec}f", Double.box(v))
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse else s
    }
    // qNN id prefix of a query key ("q41_dedup_ngram_jaccard" -> "q41")
    // — trivially mapped back to the full-name pins in BASELINE.md,
    // whose keys start with the id. If a future pair of queries ever
    // shares an id the short tier is silently SKIPPED (falling through
    // to totals-only), never aborted: by this point the suite has been
    // timed, and an unambiguous partial line beats losing the run.
    def shortKey(k: String): String = k.takeWhile(_ != '_')
    val shortKeysUnique =
      results.map(r => shortKey(r._1)).distinct.size == results.size
    if (!shortKeysUnique)
      System.err.println("[bench] query id prefixes collide; short-key tier disabled")
    def render(num: Double => String, allErrs: Boolean,
        withQueries: Boolean = true, shortKeys: Boolean = false): String = {
      val qs =
        if (withQueries)
          results.map { case (k, v) =>
            "\"" + (if (shortKeys) shortKey(k) else k) + "\":" + num(v) }
            .mkString(""","queries":{""", ",", "}")
        else ""
      val errs =
        if (errors.isEmpty && !allErrs) ""
        else errors.map("\"" + _ + "\"").mkString(",\"errors\":[", ",", "]")
      val total = num(results.map(_._2).sum)
      // sf as a bare number when the dir follows the testdata layout
      // (driver always passes .../sfX.Y) — trims 20 chars vs the path.
      val sf = "sf([0-9.]+)$".r.findFirstMatchIn(sfDir)
        .map(_.group(1)).getOrElse("\"" + sfDir + "\"")
      // the short-key tier declares itself so a consumer pinned to full
      // names can detect which map it is parsing instead of silently
      // missing every key
      val keys = if (shortKeys) ""","keys":"short"""" else ""
      s"""{"metric":"total","value":$total,"unit":"sec"$qs$errs$keys,"sf":$sf}"""
    }
    // Length-adaptive: full names at centisecond precision while they
    // fit; then decisecond; then the qNN short-key map (documented in
    // BASELINE.md — full names and full precision always live in
    // bench_out.json); only if even that overflows, totals alone (a
    // parseable total beats an unparseable line).
    val tiers = Seq(
      () => render(fmt(2), allErrs = false),
      () => render(fmt(1), allErrs = false)) ++
      (if (shortKeysUnique)
        Seq(() => render(fmt(2), allErrs = false, shortKeys = true),
          // decisecond short keys: the last per-query tier before
          // totals-only — at 153 queries the centisecond short map sits
          // ~100 chars under the budget, so the next handful of rows
          // would otherwise drop the whole map
          () => render(fmt(1), allErrs = false, shortKeys = true))
      else Nil)
    val compact = tiers.view.map(_.apply()).find(_.length <= 1900)
      .getOrElse {
        System.err.println("[bench] per-query map exceeds the stdout " +
          "budget even with short keys; emitting totals only (see bench_out.json)")
        render(fmt(1), allErrs = false, withQueries = false)
      }
    println(compact)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try Files.writeString(Paths.get(out), render(_.toString, allErrs = true) + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
