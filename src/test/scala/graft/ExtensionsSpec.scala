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

  test("graft_zorder interleaves bits like the z-store layout key") {
    // a = 0b11 (bits at 0,1 -> positions 0,2), b = 0b1 (bit 0 -> position 1)
    val r = spark.sql("SELECT graft_zorder(3L, 1L) AS z").collect().head.getLong(0)
    assert(r == 7L) // 0b111
    val grid = spark.sql(
      "SELECT graft_zorder(65535L, 65535L) AS hi, graft_zorder(0L, 0L) AS lo")
      .collect().head
    assert(grid.getLong(0) == -1L >>> 32 && grid.getLong(1) == 0L)
    // the SQL expression tree and the store's Column composition are two
    // spellings of one key: pin them to each other over a value sweep
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val pairs = Seq((0L, 0L), (3L, 1L), (65535L, 0L), (0L, 65535L),
      (12345L, 54321L), (65535L, 65535L)).toDF("a", "b")
    val viaSql = pairs.selectExpr("graft_zorder(a, b) AS z").collect().map(_.getLong(0))
    val viaCol = pairs.select(
      graft.sources.ZOrderStore.interleave16(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    assert(viaSql.sameElements(viaCol))
  }

  test("graft_minhash / graft_simhash / graft_lsh_codes are callable from SQL") {
    val mh = spark.sql(
      "SELECT graft_minhash(array(xxhash64('a'), xxhash64('b')), 4) AS sig")
      .collect().head.getSeq[Long](0)
    assert(mh.length == 4)
    // each signature slot is the min over the re-keyed element hashes —
    // deterministic, so a second evaluation is identical
    val mh2 = spark.sql(
      "SELECT graft_minhash(array(xxhash64('a'), xxhash64('b')), 4) AS sig")
      .collect().head.getSeq[Long](0)
    assert(mh == mh2)

    val sh = spark.sql(
      "SELECT graft_simhash(array(1L, 3L, 3L), 2) AS s").collect().head.getLong(0)
    // bit 0: values 1,1,1 -> majority 1; bit 1: 0,1,1 -> majority 1
    assert(sh == 3L)
    // empty token array: 0, not all-bits-set — zero tokens is zero
    // evidence for any bit, and the q43 SQL twin's list_sum(empty) is
    // NULL so no bit fires there either (engine parity on every input)
    val shEmpty = spark.sql(
      "SELECT graft_simhash(array_remove(array(1L), 1L), 64) AS s")
      .collect().head.getLong(0)
    assert(shEmpty == 0L, s"empty-array simhash must be 0, got $shEmpty")

    val codes = spark.sql(
      "SELECT graft_lsh_codes(array(1.0d, -2.0d, 0.5d), 3, 8, 7) AS c")
      .collect().head.getSeq[Long](0)
    assert(codes.length == 3)
    assert(codes.forall(c => c >= 0 && c < 256), s"codes outside 8 bits: $codes")
  }

  test("literal-argument contracts are enforced for every sketch function") {
    for (bad <- Seq(
        "SELECT graft_minhash(array(1L), cast(rand() * 4 AS INT))",
        "SELECT graft_simhash(array(1L), cast(rand() * 4 AS INT))",
        "SELECT graft_lsh_codes(array(1.0d), 3, 8, cast(rand() * 4 AS INT))")) {
      val e = intercept[Exception] { spark.sql(bad).collect() }
      assert(e.getMessage.contains("literal"), s"$bad -> ${e.getMessage}")
    }
    // out-of-int-range literals must be rejected, not truncated
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array(1L), 4294967300)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("overflow") ||
      e.getMessage.contains("integer"), e.getMessage)
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
