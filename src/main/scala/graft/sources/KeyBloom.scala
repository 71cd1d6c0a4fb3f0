package graft.sources

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Per-file key-membership BLOOM FILTERS for the stats manifests
  * (round-14 verdict #3): (min, max) bands prune point probes well on
  * key-clustered stores, but a SCATTERED key batch overlaps every band,
  * so the dv presence check and multi-key planning degrade to scanning
  * every owning file's key column. A small bloom per file — written at
  * commit/heal time alongside mn/mx, the Parquet bloom-filter / Delta
  * stats idea — lets the planner subtract files that hold NO probed key
  * before any data file opens. Zero false negatives by construction
  * (a bloom only over-approximates its key set), so pruning stays a
  * pure optimization: a false positive costs one redundant file read,
  * never a missed row.
  *
  * Filters build at a fixed [[MaxBits]] width cluster-side (the OR of
  * set-bit maps is commutative and associative, so the aggregate is
  * partial-aggregable and deterministic under any partitioning), then
  * FOLD down to the smallest power-of-two width that keeps the load
  * factor at or under 1/2: folding ORs the upper half onto the lower,
  * which preserves membership exactly because bit indices are the low
  * bits of the hash (idx mod 2^j is the truncation of idx mod 2^17).
  * Small files thus serialize to tens of bytes while a near-full file
  * keeps the width its key count needs — the manifest stays k-row
  * driver-broadcast material either way. At ~0.5 load with
  * [[NumHashes]] probes the false-positive rate is ≈ 2^-6.
  */
object KeyBloom {

  /** Build-time bit width (16 KiB of buffer per open group) — sized for
    * ~10k keys/file at 0.5 load; production files with more distinct
    * keys saturate toward all-ones, which degrades pruning gracefully
    * (more candidates survive) but can never lose a member. */
  val MaxBits: Int = 1 << 17
  val NumHashes: Int = 6
  /** Folding floor: below this width the header outweighs the bits. */
  val MinBits: Int = 256

  /** splitmix64 finalizer — a full-avalanche 64-bit mix, public-domain
    * constants (Steele et al., "Fast splittable pseudorandom number
    * generators"). */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** The i-th probe's bit index at FULL width. Kirsch–Mitzenmacher
    * double hashing: k indices from two mixes, h2 forced odd so the
    * probe sequence spans the (power-of-two) table. */
  private def bitIdx(key: Long, i: Int): Int = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0xda3e39cb94b95bdbL) | 1L
    ((h1 + i * h2) & (MaxBits - 1)).toInt
  }

  private def setBit(bits: Array[Byte], idx: Int): Unit =
    bits(idx >>> 3) = (bits(idx >>> 3) | (1 << (idx & 7))).toByte

  private def getBit(bits: Array[Byte], idx: Int): Boolean =
    (bits(idx >>> 3) & (1 << (idx & 7))) != 0

  private[sources] def add(bits: Array[Byte], key: Long): Unit = {
    var i = 0
    while (i < NumHashes) { setBit(bits, bitIdx(key, i)); i += 1 }
  }

  /** Fold a width-2m bit array to width m: OR the upper half onto the
    * lower. Membership-preserving (indices truncate). */
  private def foldOnce(bits: Array[Byte]): Array[Byte] = {
    val half = bits.length / 2
    val out = new Array[Byte](half)
    var i = 0
    while (i < half) { out(i) = (bits(i) | bits(i + half)).toByte; i += 1 }
    out
  }

  private def popcount(bits: Array[Byte]): Int = {
    var (n, i) = (0, 0)
    while (i < bits.length) { n += Integer.bitCount(bits(i) & 0xff); i += 1 }
    n
  }

  /** Serialize a full-width bit array as the smallest fold that keeps
    * load <= 1/2: one header byte (log2 of the folded bit width) + the
    * folded bits. */
  private[sources] def seal(full: Array[Byte]): Array[Byte] = {
    var cur = full
    var curBits = MaxBits
    while (curBits > MinBits && {
      val folded = foldOnce(cur)
      if (popcount(folded) * 2 <= curBits / 2) { cur = folded; curBits /= 2; true }
      else false
    }) ()
    val log2 = java.lang.Integer.numberOfTrailingZeros(curBits)
    val out = new Array[Byte](1 + cur.length)
    out(0) = log2.toByte
    System.arraycopy(cur, 0, out, 1, cur.length)
    out
  }

  /** Membership probe against a sealed bloom. `null` means "no filter
    * recorded" — the caller must treat that as might-contain. */
  def mightContain(sealed0: Array[Byte], key: Long): Boolean = {
    if (sealed0 == null || sealed0.length < 2) return true
    val bits = 1 << (sealed0(0) & 0x3f)
    if (1 + bits / 8 > sealed0.length) return true // malformed: fail open
    var i = 0
    while (i < NumHashes) {
      val idx = bitIdx(key, i) & (bits - 1)
      if ((sealed0(1 + (idx >>> 3)) & (1 << (idx & 7))) == 0) return false
      i += 1
    }
    true
  }

  private class BloomAgg extends Aggregator[Long, Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = new Array[Byte](MaxBits / 8)
    def reduce(b: Array[Byte], key: Long): Array[Byte] = { add(b, key); b }
    def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < x.length) { x(i) = (x(i) | y(i)).toByte; i += 1 }
      x
    }
    def finish(b: Array[Byte]): Array[Byte] = seal(b)
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** `bloomAgg(keyCol)`: the sealed bloom of a group's long keys — the
    * per-file aggregate the stats-manifest writers run alongside
    * min/max. */
  def bloomAgg(key: Column): Column = udaf(new BloomAgg).apply(key)

  /** Planning-side membership as a column predicate: true when `bloom`
    * is null (no filter recorded — fail open) or might contain `key`.
    * A Scala UDF is acceptable HERE because it runs only in planning
    * joins over (probe keys x k-row broadcast stats), never on a data
    * scan path. */
  def mightContainCol(bloom: Column, key: Column): Column = {
    val f = org.apache.spark.sql.functions.udf(
      (b: Array[Byte], k: Long) => mightContain(b, k))
    f(bloom, key)
  }
}
