package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (saves ~5s JVM+session per suite). */
object TestSpark {
  lazy val spark: SparkSession = Engine.session("local[4]", shufflePartitions = 4)
  val sf: String = "/root/testdata/sf0.001"
}
