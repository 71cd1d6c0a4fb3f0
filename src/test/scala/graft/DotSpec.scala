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
