package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  import TestSpark.spark

  test("graft_dot is callable from SQL via SparkSessionExtensions") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect().head.getDouble(0)
    assert(r == 32.0)
  }

  test("graft_dot over a table column matches the Column API") {
    import org.apache.spark.sql.functions.col
    import graft.functions.VectorOps
    Tables.embeddings(spark, TestSpark.sf)
      .select(VectorOps.asDouble(col("embedding")).as("e"))
      .createOrReplaceTempView("emb_v")
    val sqlSum = spark.sql("SELECT sum(graft_dot(e, e)) FROM emb_v").collect().head.getDouble(0)
    val apiSum = Tables.embeddings(spark, TestSpark.sf)
      .select(VectorOps.asDouble(col("embedding")).as("e"))
      .select(VectorOps.dot(col("e"), col("e")).as("d"))
      .agg(org.apache.spark.sql.functions.sum("d")).collect().head.getDouble(0)
    assert(sqlSum == apiSum)
  }
}
