package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Closes the skew loop on JOINS: q111 diagnoses the hot key, q24
  * salts aggregations — this spec proves the two JOIN mitigations on a
  * PLANTED hot key (one key owning half the fact rows, far past
  * q111's >10×-mean threshold):
  *
  *  - the salted join (deterministic fact-side salt + salts× dimension
  *    replication) returns row-for-row the direct join's result;
  *  - Spark's AQE skew handling (OptimizeSkewedJoin) actually SPLITS
  *    the hot partition when the shuffle sizes cross its thresholds —
  *    the zero-code-change path a production config relies on.
  */
class SkewJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** 60k facts: key 0 owns half of them (the planted straggler); dim
    * has one attribute row per key. */
  private def planted = {
    val fact = spark.range(60000).select(
      when(col("id") % 2 === 0, 0L).otherwise(col("id") % 64).as("k"),
      col("id").as("row_id"), (col("id") * 7 % 1000).as("v"))
    val dim = spark.range(64).select(col("id").as("k"),
      concat(lit("attr_"), col("id")).as("attr"))
    (fact, dim)
  }

  test("salted join equals the direct join on a planted 10x-hot key") {
    val (fact, dim) = planted
    // sanity: the plant IS skewed by q111's own hot-key rule
    val counts = fact.groupBy(col("k")).count().collect()
    val mean = counts.map(_.getLong(1)).sum / counts.length
    assert(counts.filter(_.getLong(0) == 0L).head.getLong(1) > 10 * mean,
      "planted key is not hot enough to exercise the mitigation")

    val direct = fact.join(dim, Seq("k"))
      .select(col("row_id"), col("k"), col("v"), col("attr"))
    // salt from a HASH of the row-unique column: the hot key's rows
    // are all even ids here, so a bare modulo would only reach half
    // the salt buckets — exactly the correlation trap a deterministic
    // salt must avoid
    val salted = operators.Relational
      .saltedJoin(fact, xxhash64(col("row_id")), dim, "k", salts = 8)
      .select(col("row_id"), col("k"), col("v"), col("attr"))
    assert(direct.count() == fact.count(), "direct join dropped/duplicated rows")
    assert(salted.except(direct).isEmpty && direct.except(salted).isEmpty,
      "salted join diverged from the direct join")
    // the salt genuinely spreads the hot key: its rows occupy every
    // salt bucket, so no single task inherits the key whole
    val spread = fact.withColumn("s", pmod(xxhash64(col("row_id")), lit(8L)))
      .filter(col("k") === 0L).select(col("s")).distinct().count()
    assert(spread == 8, s"hot key spread over $spread of 8 salt buckets")

    // a NULL salt source must not drop the row (review finding): the
    // identity-with-direct-join contract holds for every row. The salt
    // column here is the RAW nullable column (xxhash64 would mask the
    // case — it hashes NULL to its seed), so pmod propagates the NULL
    // and only the coalesce guard keeps the row joined.
    val nullFact = fact.withColumn("row_id",
      when(col("row_id") === 2L, lit(null).cast("long")).otherwise(col("row_id")))
    val nullSalted = operators.Relational
      .saltedJoin(nullFact, col("row_id"), dim, "k", salts = 8)
    assert(nullSalted.count() == fact.count(),
      "NULL salt source dropped rows from the salted join")
  }

  test("AQE splits the skewed partition of a shuffle join on the planted key") {
    // a session tuned so the test-scale shuffle crosses the skew
    // thresholds: tiny advisory sizes, broadcast off (force the
    // sort-merge path AQE's OptimizeSkewedJoin rewrites)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.shuffle.partitions", "8")

    val fact = s2.range(120000).select(
      when(col("id") % 2 === 0, 0L).otherwise(col("id") % 64).as("k"),
      col("id").as("row_id"),
      // widen rows so the hot partition's bytes cross the threshold
      concat_ws("_", Seq.fill(8)(col("id").cast("string")): _*).as("pad"))
    val dim = s2.range(64).select(col("id").as("k"),
      concat(lit("attr_"), col("id")).as("attr"))
    val joined = fact.join(dim, Seq("k"))
    // execute THIS df's own QueryExecution (count() would plan a
    // separate aggregate query and leave joined's adaptive plan unrun)
    assert(joined.collect().length == 120000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE did not mark the join skew-handled:\n$plan")
  }
}
