package graft.operators

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** One (score, key) candidate for a bounded top-k aggregate. */
case class ScoredKey(score: Double, key: Long)

/** Bounded top-k aggregate: keeps the k highest-score rows per group
  * (score desc, key asc tie-break) with O(k) state.
  *
  * This replaces `row_number() OVER (PARTITION BY lowCardKey ...)` for
  * top-k-per-group: a window sorts every row of every partition through
  * as many tasks as the partition key has values (a handful, at 100 TB a
  * scale-killer); this aggregator is partial-aggregable, so each map task
  * reduces its input to k rows before the shuffle and the shuffle carries
  * k rows per (task, group). Origin of the pattern:
  * /root/reference/impala/ny_taxi/bi_top_ten_venders_in_trips.impala
  * (top-N per dimension).
  */
class TopKByScore(k: Int)
    extends Aggregator[ScoredKey, Seq[ScoredKey], Seq[ScoredKey]] {
  private val ord: Ordering[ScoredKey] =
    Ordering.by((s: ScoredKey) => (-s.score, s.key))

  def zero: Seq[ScoredKey] = Vector.empty
  def reduce(b: Seq[ScoredKey], a: ScoredKey): Seq[ScoredKey] =
    if (b.size < k) (b :+ a).sorted(ord)
    else if (ord.lt(a, b.last)) (b.init :+ a).sorted(ord)
    else b
  def merge(x: Seq[ScoredKey], y: Seq[ScoredKey]): Seq[ScoredKey] =
    (x ++ y).sorted(ord).take(k)
  def finish(r: Seq[ScoredKey]): Seq[ScoredKey] = r
  def bufferEncoder: Encoder[Seq[ScoredKey]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredKey]]()
  def outputEncoder: Encoder[Seq[ScoredKey]] = bufferEncoder
}

/** One (hash, id, payload) candidate for [[BottomKByHash]]. */
case class HashedRow(hk: Long, id: Long, payload: Long)

/** Bounded bottom-k aggregate over LONG sort keys: keeps the k rows with
  * the smallest (hk, id) per group, carrying one long payload column
  * through. The long-keyed twin of [[TopKByScore]] for hash-ordered
  * deterministic sampling — the 61-bit portable hashes do not fit a
  * double's 53-bit mantissa, so a score-based aggregate would collide
  * where the hash does not. Same scale rationale: partial-aggregable,
  * O(k) state, k rows per (task, group) cross the shuffle where a
  * `row_number` window would sort the whole stratum through one task.
  */
class BottomKByHash(k: Int)
    extends Aggregator[HashedRow, Seq[HashedRow], Seq[HashedRow]] {
  private val ord: Ordering[HashedRow] =
    Ordering.by((s: HashedRow) => (s.hk, s.id))

  def zero: Seq[HashedRow] = Vector.empty
  def reduce(b: Seq[HashedRow], a: HashedRow): Seq[HashedRow] =
    if (b.size < k) (b :+ a).sorted(ord)
    else if (ord.lt(a, b.last)) (b.init :+ a).sorted(ord)
    else b
  def merge(x: Seq[HashedRow], y: Seq[HashedRow]): Seq[HashedRow] =
    (x ++ y).sorted(ord).take(k)
  def finish(r: Seq[HashedRow]): Seq[HashedRow] = r
  def bufferEncoder: Encoder[Seq[HashedRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HashedRow]]()
  def outputEncoder: Encoder[Seq[HashedRow]] = bufferEncoder
}
