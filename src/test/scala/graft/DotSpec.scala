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

  test("SortedIntersectCount equals size(array_intersect) on sorted sets") {
    import org.apache.spark.sql.functions._
    // deterministic pseudo-random sorted duplicate-free long sets with
    // forced overlap (both sides draw from a small value space)
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(500) { i =>
      def set() = Array.fill(rnd.nextInt(60))(rnd.nextInt(80).toLong)
        .distinct.sorted
      (i.toLong, set(), set())
    }
    import spark.implicits._
    val df = rows.toDF("id", "a", "b")
    def sic(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      org.apache.spark.sql.GraftSqlBridge.toColumn(functions.SortedIntersectCount(
        org.apache.spark.sql.GraftSqlBridge.toExpression(a),
        org.apache.spark.sql.GraftSqlBridge.toExpression(b)))
    val both = df.select(col("id"),
      sic(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
      .collect()
    assert(both.length == 500)
    both.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"row ${r.getLong(0)}: native=${r.getLong(1)} builtin=${r.getLong(2)}")
    }
    // SQL registration surface
    val viaSql = spark.sql(
      "SELECT graft_sorted_intersect(array(1L, 3L, 9L), array(3L, 4L, 9L))")
      .collect().head.getLong(0)
    assert(viaSql == 2L)
  }
}
