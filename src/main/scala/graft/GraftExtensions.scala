package graft

import graft.functions.{DoubleDot, HyperplaneCodes, LongDot, MinhashSignature, SimhashBits, SortedIntersectCount}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so the SQL surface has the same
  * sketch/similarity vocabulary as the Column API:
  *
  *  - `graft_dot(a, b)` — exact double dot product ([[DoubleDot]])
  *  - `graft_ldot(a, b)` — exact integer dot product over array<bigint>
  *    ([[LongDot]]; the quantized-similarity inner op)
  *  - `graft_minhash(hashes, k)` — k per-seed minhash minima over an
  *    array of element hashes ([[MinhashSignature]]; k literal)
  *  - `graft_simhash(hashes, bits)` — bit-majority simhash over an
  *    array of element hashes ([[SimhashBits]]; bits literal <= 64)
  *  - `graft_lsh_codes(e, tables, bits, seed)` — random-hyperplane sign
  *    codes of a double vector; the plane matrix is generated from the
  *    (tables, bits, seed) literals, so two sessions with the same
  *    arguments hash identically ([[HyperplaneCodes]])
  *  - `graft_sorted_intersect(a, b)` — |A ∩ B| over ascending-sorted
  *    duplicate-free array<bigint> ([[SortedIntersectCount]]; the
  *    near-dup verify kernel)
  *  - `graft_zorder(a, b)` — Morton interleave of two 16-bit grid
  *    coordinates ([[graft.functions.Morton]]; the z-store layout key,
  *    so SQL jobs can write the same clustering)
  *
  * and the store TABLE-VALUED functions (round-16, verdict #3: the
  * change feed and the stats-pruned range read as relations SQL can
  * FROM/join/filter inline, not just CALL-registered views):
  *
  *  - `graft_changes('<path>', fromV, toV, '<keyCol>')` — the
  *    row-level change feed of the committed interval (fromV, toV]
  *    ([[sources.ChangeFeed.changes]]): the Delta `table_changes(...)`
  *    shape, usable directly in a FROM clause;
  *  - `graft_select('<path>', version, '<column>', '<lo>', '<hi>')` —
  *    the version's rows with `column` in [lo, hi), opening only the
  *    files whose recorded (mn, mx) can overlap the range (the q121
  *    skip, inline). Bounds parse as the column's own type.
  *  - `graft_export('<path>', version, '<keyCol>', '<k1,k2,...>')` —
  *    the subject-access point read ([[sources.VersionedStore.readKeys]])
  *    inline; keys parse in the store's own key type (string subject
  *    ids included).
  *
  * Both resolve their plan at ANALYSIS time from literal arguments
  * (the TVF contract — the interval/range is part of the query text,
  * exactly like Delta's table_changes), so Catalyst sees an ordinary
  * logical plan: pushdown, pruning and join planning all apply.
  *
  * Install via
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — done by
  * [[Engine.session]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litStr(e: Expression, what: String): String = {
    require(e.foldable, s"$what must be a string literal")
    e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$what must be a string literal, got $other")
    }
  }

  private def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case i: Int => i
      case l: Long => java.lang.Math.toIntExact(l) // reject, don't truncate
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DoubleDot].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot takes exactly 2 arguments")
        DoubleDot(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_ldot"),
      new ExpressionInfo(classOf[LongDot].getName, "graft_ldot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_ldot takes exactly 2 arguments")
        LongDot(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinhashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_minhash takes (hashes, k)")
        MinhashSignature(children.head, litInt(children(1), "k"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimhashBits].getName, "graft_simhash"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_simhash takes (hashes, bits)")
        val bits = litInt(children(1), "bits")
        require(bits > 0 && bits <= 64, "bits must be in [1, 64]")
        SimhashBits(children.head, bits)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_intersect"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "graft_sorted_intersect"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_sorted_intersect takes exactly 2 arguments")
        SortedIntersectCount(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_zorder"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_zorder takes two 16-bit grid coordinates (a, b)")
        graft.functions.Morton.interleave16Expr(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_lsh_codes"),
      new ExpressionInfo(classOf[HyperplaneCodes].getName, "graft_lsh_codes"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          "graft_lsh_codes takes (e, tables, bits, seed)")
        val tables = litInt(children(1), "tables")
        val bits = litInt(children(2), "bits")
        val seed = litInt(children(3), "seed")
        require(tables > 0 && bits > 0 && bits <= 64,
          "tables must be positive, bits in [1, 64]")
        // 64-dim planes: the corpus embedding width; a SQL caller with a
        // different width gets exact codes anyway because the dot loop
        // bounds itself by min(plane, vector) length.
        val rnd = new scala.util.Random(seed)
        val planes = Array.fill(tables * bits)(Array.fill(64)(rnd.nextGaussian()))
        HyperplaneCodes(children.head, planes, bits)
      }))
    // store TVFs: the builder runs at analysis time with literal
    // arguments and returns the built DataFrame's logical plan — the
    // outer query then optimizes it like any relation. The metadata
    // work (manifest listings, the chunked walk) runs once, at
    // planning, the same point the CALL verbs pay it.
    ext.injectTableFunction((
      new FunctionIdentifier("graft_changes"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_changes"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_changes takes ('<path>', fromV, toV, '<keyCol>')")
        val s = org.apache.spark.sql.SparkSession.active
        sources.ChangeFeed.changes(s, litStr(args(0), "path"),
          litInt(args(1), "fromV"), litInt(args(2), "toV"),
          litStr(args(3), "keyCol")).queryExecution.logical
      }))
    ext.injectTableFunction((
      new FunctionIdentifier("graft_export"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_export"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "graft_export takes ('<path>', version, '<keyCol>', '<k1,k2,...>')")
        val s = org.apache.spark.sql.SparkSession.active
        GraftCatalog.exportKeys(s, litStr(args(0), "path"),
          litInt(args(1), "version"), litStr(args(2), "keyCol"),
          litStr(args(3), "keys")).queryExecution.logical
      }))
    ext.injectTableFunction((
      new FunctionIdentifier("graft_history"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_history"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_history takes ('<path>')")
        val s = org.apache.spark.sql.SparkSession.active
        sources.StoreLineage.history(s, litStr(args(0), "path"))
          .queryExecution.logical
      }))
    ext.injectTableFunction((
      new FunctionIdentifier("graft_snapshot"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_snapshot"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_snapshot takes ('<path>', version | '<tag>' | '<timestamp>')")
        val s = org.apache.spark.sql.SparkSession.active
        val path = litStr(args(0), "path")
        // an int literal reads VERSION AS OF; a string literal reads by
        // TAG, or — when no such tag exists and the string parses as a
        // timestamp — TIMESTAMP AS OF (round-16 verdict #7: the SQL
        // surface now matches readAsOf's operator surface). Resolution
        // order version -> existing tag -> timestamp is total: tag
        // names exclude ':' and ' ', so a full timestamp literal can
        // never collide; a date-shaped tag name ('2024-01-01') shadows
        // the same-text date probe BY DESIGN (drop the tag to as-of).
        require(args(1).foldable, "graft_snapshot version/tag must be a literal")
        val v = args(1).eval() match {
          case i: Int => i
          case l: Long => java.lang.Math.toIntExact(l)
          case u: org.apache.spark.unsafe.types.UTF8String =>
            val str = u.toString
            str.toIntOption.getOrElse {
              if (sources.StoreLineage.tags(s, path).exists(_._1 == str))
                sources.StoreLineage.resolveTag(s, path, str)
              else scala.util.Try(java.sql.Timestamp.valueOf(
                  if (str.contains(" ") || str.contains("T"))
                    str.replace("T", " ")
                  else str + " 00:00:00").getTime).toOption match {
                case Some(ms) =>
                  sources.VersionedStore.versionAsOf(s, path, ms)
                case None =>
                  sources.StoreLineage.resolveTag(s, path, str) // loud
              }
            }
          case other => throw new IllegalArgumentException(
            s"graft_snapshot second argument must be a version, tag or " +
              s"timestamp literal, got $other")
        }
        sources.VersionedStore.readVersion(s, path, v)
          .queryExecution.logical
      }))
    ext.injectTableFunction((
      new FunctionIdentifier("graft_quarantine"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_quarantine"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_quarantine takes ('<path>', version)")
        val s = org.apache.spark.sql.SparkSession.active
        sources.Expectations.quarantine(s, litStr(args(0), "path"),
          litInt(args(1), "version")).queryExecution.logical
      }))
    ext.injectTableFunction((
      new FunctionIdentifier("graft_select"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_select"),
      (args: Seq[Expression]) => {
        require(args.length == 5,
          "graft_select takes ('<path>', version, '<column>', '<lo>', '<hi>')")
        val s = org.apache.spark.sql.SparkSession.active
        GraftCatalog.prunedRange(s, litStr(args(0), "path"),
          litInt(args(1), "version"), litStr(args(2), "column"),
          litStr(args(3), "lo"), litStr(args(4), "hi"))
          .queryExecution.logical
      }))
  }
}
