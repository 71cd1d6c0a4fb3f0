package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math as codegen'd builtin higher-order functions (no
  * UDFs): dot products and norms are `zip_with` + left-fold `aggregate`,
  * which keeps the 64-dim arithmetic inside whole-stage codegen.
  *
  * The fold order (left-to-right, init 0.0) is fixed, so the IEEE double
  * op sequence is deterministic and the DuckDB oracle reproduces it
  * bit-for-bit with list_transform + list_reduce ([[sqlDot]]); 0.0 + x1
  * == x1 exactly, so Spark's init-seeded fold equals DuckDB's init-less
  * list_reduce.
  */
object VectorOps {
  /** Elementwise dot product of two array<double> columns — the native
    * codegen'd [[DoubleDot]] expression (identical fold semantics to the
    * zip_with/aggregate composition, ~10x cheaper in the pair loop). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(DoubleDot(
      org.apache.spark.sql.GraftSqlBridge.toExpression(a),
      org.apache.spark.sql.GraftSqlBridge.toExpression(b)))

  /** Builtin-composition twin of [[dot]] (kept as the portable reference
    * implementation; DotSpec asserts both agree bit-for-bit). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm. */
  def norm2(a: Column): Column = dot(a, a)

  /** Cosine from a precomputed dot and squared norms (compute norms once
    * per vector, not once per pair). */
  def cosineFrom(d: Column, n2a: Column, n2b: Column): Column =
    d / (sqrt(n2a) * sqrt(n2b))

  /** array<float> parquet column → array<double> for exact portable math. */
  def asDouble(a: Column): Column = a.cast("array<double>")

  // ---- DuckDB twins ----

  def sqlDot(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), p -> p[1] * p[2]), (x, y) -> x + y)"

  def sqlNorm2(a: String): String =
    s"list_reduce(list_transform($a, x -> x * x), (y, z) -> y + z)"

  /** FLOAT[] → DOUBLE[]. */
  def sqlAsDouble(a: String): String = s"CAST($a AS DOUBLE[])"
}
