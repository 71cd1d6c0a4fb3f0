package graft

import graft.functions.VectorOps
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class DotSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("native DoubleDot is bit-identical to the zip_with/aggregate fold") {
    val v = Tables.embeddings(spark, sf)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("e"))
    val both = v.select(col("vec_id"),
      VectorOps.dot(col("e"), col("e")).as("native"),
      VectorOps.dotHof(col("e"), col("e")).as("hof")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"vec ${r.getLong(0)}: native=${r.getDouble(1)} hof=${r.getDouble(2)}")
    }
  }

  test("native LongDot equals the zip_with/aggregate fold on quantized codes") {
    import org.apache.spark.sql.functions._
    val codes = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x * 100).cast("long")).as("q"))
    def ldot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      org.apache.spark.sql.GraftSqlBridge.toColumn(functions.LongDot(
        org.apache.spark.sql.GraftSqlBridge.toExpression(a),
        org.apache.spark.sql.GraftSqlBridge.toExpression(b)))
    val both = codes.select(col("vec_id"),
      ldot(col("q"), col("q")).as("native"),
      aggregate(zip_with(col("q"), col("q"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x).as("hof")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"vec ${r.getLong(0)}: native=${r.getLong(1)} hof=${r.getLong(2)}")
    }
  }

  test("LongDot returns null on mismatched lengths, is SQL-callable") {
    val r = spark.sql(
      "SELECT graft_ldot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d," +
        " graft_ldot(array(1L, 2L), array(1L)) AS m").collect().head
    assert(r.getLong(0) == 32L)
    assert(r.isNullAt(1), "mismatched lengths must yield null")
  }

  test("DoubleDot participates in whole-stage codegen") {
    val v = Tables.embeddings(spark, sf)
      .select(VectorOps.asDouble(col("embedding")).as("e"))
      .select(VectorOps.dot(col("e"), col("e")).as("d"))
    // codegen'd operators print with the "*(stageId)" prefix
    val plan = v.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [doubledot"),
      s"doubledot not inside a codegen span:\n$plan")
  }
}
