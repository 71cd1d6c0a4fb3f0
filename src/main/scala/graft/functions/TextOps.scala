package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text column functions shared by the §2.C text operators and the §2.D
  * dedup family. Everything here is a composition of codegen'd builtin
  * higher-order functions — no UDFs — so the expressions stay inside
  * whole-stage codegen and are row-local (no shuffle, no driver work).
  *
  * Hashes come in two flavors:
  *  - [[polyHash61]]: an engine-portable polynomial hash (two 31-bit
  *    polynomial folds combined into 61 bits) that the DuckDB oracle can
  *    reproduce exactly with list_reduce — used wherever the oracle must
  *    recompute the hash (fingerprints, simhash).
  *  - Spark's builtin `xxhash64` — used where only the final, verified
  *    output must match the oracle (minhash signatures, LSH bucket ids),
  *    because signatures never leave the candidate-generation stage.
  */
object TextOps {
  val P: Long = 1000000007L

  /** Whitespace tokens. */
  def toks(text: Column): Column = split(text, " ")

  /** Polynomial fold over the characters of `s`: acc = (acc*mult + ord) % P.
    * Oracle twin: [[sqlPolyHash]]. */
  def polyHash(s: Column, mult: Long): Column =
    aggregate(split(s, ""), lit(0L),
      (acc, ch) => (acc * mult + ascii(ch).cast("long")) % P)

  /** 61-bit portable hash: low 31 bits from mult=31, high bits from
    * mult=37 shifted left — both folds stay far below Long overflow. */
  def polyHash61(s: Column): Column =
    polyHash(s, 31L) + shiftleft(polyHash(s, 37L), 31)

  /** Per-token 64-bit portable hashes for the simhash family (q43).
    *
    * [[polyHash61]] leaves bits 30 and 61-63 structurally zero (each
    * fold stays under P < 2^30), which would leave two of a 64-bit
    * simhash's four 16-bit bands with dead bits — exactly the collision
    * head-room the wider hash exists to buy. This mix spreads the same
    * two folds (a = mult 31, b = mult 37, no extra fold cost) as
    *
    *   h = a XOR (b << 30) XOR ((a XOR b) << 33)
    *
    * so bands 0-2 are full-rank 16-bit linear maps of the 60 underlying
    * fold bits and band 3 is rank 15 (rank argument: bits 0-29 recover
    * a, bits 30-59 then recover b band-triangularly, bits 60-62 are
    * independent combos of the top fold bits; bit liveness is asserted
    * per-position in DedupSpec). Bit 63 stays CLEAR by construction —
    * the DuckDB twin's `<<` raises on any shift reaching the sign bit,
    * so the mix is chosen to keep every intermediate inside a signed
    * 64-bit range in both engines (xor/shift semantics otherwise match
    * Java exactly; probed in scripts/check.py's engine). Aggregate
    * random band-collision rate: 3/2^16 + 1/2^15, exactly 16x below the
    * 48-bit config's 3/2^12 + 1/2^11 (which had its own dead bit 30 in
    * one band).
    *
    * zip_with over two transform passes keeps it at the same two
    * interpreted folds per token as polyHash61 (a single lambda with
    * both folds inlined would evaluate each fold twice — HOF lambdas
    * never enter codegen, so nothing CSEs them). */
  def tokenHashes64(tokens: Column): Column =
    zip_with(
      transform(tokens, t => polyHash(t, 31L)),
      transform(tokens, t => polyHash(t, 37L)),
      (a, b) => a.bitwiseXOR(shiftleft(b, 30))
        .bitwiseXOR(shiftleft(a.bitwiseXOR(b), 33)))

  /** Word 3-gram shingles (with duplicates; wrap in array_distinct for the
    * set). Empty array for texts shorter than 3 tokens. */
  def shingles3(tokens: Column): Column =
    when(size(tokens) >= 3,
      transform(sequence(lit(1), size(tokens) - 2),
        i => concat_ws(" ",
          element_at(tokens, i), element_at(tokens, i + 1), element_at(tokens, i + 2))))
      .otherwise(array().cast("array<string>"))

  // ---- DuckDB twins (used to build oracle SQL strings) ----

  def sqlPolyHash(expr: String, mult: Long): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split_regex($expr, ''), c -> CAST(ord(c) AS BIGINT))), " +
      s"(a, b) -> (a * $mult + b) % $P)"

  def sqlPolyHash61(expr: String): String =
    s"(${sqlPolyHash(expr, 31L)} + (${sqlPolyHash(expr, 37L)} << 31))"

  /** DuckDB twin of [[tokenHashes64]] (the lambda re-evaluates each fold
    * once per use — the oracle runs once at sf0.01, linear cost). */
  def sqlTokenHashes64(tokensExpr: String): String = {
    val a = sqlPolyHash("w", 31L)
    val b = sqlPolyHash("w", 37L)
    s"list_transform($tokensExpr, w -> xor(xor($a, $b << 30), xor($a, $b) << 33))"
  }

  def sqlShingles3(tokensExpr: String): String =
    s"list_transform(range(1, len($tokensExpr) - 1), " +
      s"i -> $tokensExpr[i] || ' ' || $tokensExpr[i+1] || ' ' || $tokensExpr[i+2])"
}
