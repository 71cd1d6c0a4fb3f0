package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exactly-reproducible numeric aggregation.
  *
  * The correctness oracle (DuckDB) hash-compares values, so float
  * aggregates must be bit-identical across engines. Raw `sum(double)`
  * is order-dependent; instead, 2-decimal money columns are scaled to
  * integer cents (`round(x*100)` is exact for 2-decimal data), summed
  * exactly as BIGINT, and converted back with a single deterministic
  * double division. Averages divide the exact sum by the exact count.
  *
  * The DuckDB-side expressions live in [[Num.sql]]; Spark and SQL
  * strings are kept structurally identical so the IEEE op sequence
  * matches bit-for-bit.
  */
object Num {
  /** Integer cents of a 2-decimal double column (exact). */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Exact sum of a 2-decimal money column, as double. */
  def moneySum(c: Column): Column = sum(cents(c)) / 100.0

  /** Exact mean of a 2-decimal money column, as double. */
  def moneyAvg(c: Column): Column = sum(cents(c)) / 100.0 / count(lit(1))

  /** Exact sum of an integral-valued double column, as long. */
  def intSum(c: Column): Column = sum(round(c).cast("long"))

  /** Scale-10^k integer of a double column (exact for k-decimal data). */
  def scaled(c: Column, k: Int): Column = round(c * math.pow(10, k)).cast("long")

  /** DuckDB-side twins of the Spark expressions above. */
  object sql {
    def cents(col: String): String = s"CAST(round(($col)*100) AS BIGINT)"
    def moneySum(col: String): String = s"sum(${cents(col)})/100.0"
    def moneyAvg(col: String): String = s"sum(${cents(col)})/100.0/count(*)"
    def intSum(col: String): String = s"CAST(sum(CAST(round($col) AS BIGINT)) AS BIGINT)"
    def count: String = "count(*)"
  }
}
