package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A group of named queries plus their DuckDB oracle SQL.
  *
  * `queries` keys and output column names must match the oracle exactly:
  * the driver sorts columns by name and hash-compares values.
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  /** Subset of `queries` keys that are ANSI-SQL expressible in DuckDB. */
  def oracleSql: Map[String, String]
}
