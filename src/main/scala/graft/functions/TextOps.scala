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

  def sqlShingles3(tokensExpr: String): String =
    s"list_transform(range(1, len($tokensExpr) - 1), " +
      s"i -> $tokensExpr[i] || ' ' || $tokensExpr[i+1] || ' ' || $tokensExpr[i+2])"
}
