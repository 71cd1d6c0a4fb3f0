package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic reading generator — the load/fault-injection twin of the
  * reference's driver-loop Kafka producer
  * (connected_car/ConnectedCarReadingGenerator.scala:1-199: loop over a
  * car-properties file, one CSV reading per car per second via
  * Thread.sleep, per-car base values + gaussian jitter, and a
  * `-generateErrors` flag that corrupts readings).
  *
  * Spark-first shape: the generator is a TRANSFORM from a tick stream to
  * CSV reading lines — rate control belongs to the source (the built-in
  * `rate` source's rowsPerSecond replaces sleep-per-iteration, exactly
  * as KafkaPublisher's maxFilesPerTrigger replaces sleep-per-record),
  * and the per-reading jitter is hash-derived from (tick, vin), so a
  * replayed tick range regenerates byte-identical traffic — a
  * deterministic load test, which the reference's Random can never be.
  * The cars dimension rides as a broadcast local relation (the
  * properties file is a dim table, never sharded). `errorEvery` is the
  * `-generateErrors` twin: every Nth (tick, car) cell emits a malformed
  * short line, which the q19 drop rule must reject downstream.
  */
object ReadingGenerator {

  /** One row of the reference's car properties file. */
  case class CarProps(vin: String, baseAccel: Double, baseBrake: Double)

  /** Production tick source: `rowsPerSecond` ticks/s from the built-in
    * rate source (each tick fans out to one reading per car). */
  def rateTicks(s: SparkSession, rowsPerSecond: Int): DataFrame =
    s.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()
      .select(col("value").as("tick"))

  /** ±0.5-range deterministic jitter derived from (tick, vin, salt) —
    * the gaussian-noise stand-in that keeps generated load replayable. */
  private def jitter(salt: String): org.apache.spark.sql.Column =
    (pmod(xxhash64(col("tick"), col("vin"), lit(salt)), lit(1000L))
      .cast("double") / 1000.0) - 0.5

  /** tick stream × cars → CSV lines `vin,tick,accel,brake`. Every
    * `errorEvery`-th (tick, car) cell (by position, so a spec can count
    * them exactly) emits the malformed line "BAD" instead. */
  def readings(ticks: DataFrame, cars: Seq[CarProps],
      errorEvery: Option[Int] = None): DataFrame = {
    val s = ticks.sparkSession
    import s.implicits._
    val carsDf = cars.zipWithIndex
      .map { case (c, i) => (c.vin, c.baseAccel, c.baseBrake, i.toLong) }
      .toDF("vin", "base_accel", "base_brake", "car_idx")
    // round+cast, not format_number: the latter inserts locale thousands
    // separators, which would corrupt the CSV for large bases
    val line = concat_ws(",",
      col("vin"), col("tick").cast("string"),
      round(col("base_accel") + jitter("acc"), 3).cast("string"),
      round(col("base_brake") + jitter("brk"), 3).cast("string"))
    val out = ticks.crossJoin(broadcast(carsDf))
    errorEvery match {
      case None => out.select(line.as("line"))
      case Some(n) =>
        out.select(
          when(pmod(col("tick") * cars.size + col("car_idx"), lit(n.toLong)) === 0,
            lit("BAD")).otherwise(line).as("line"))
    }
  }

  /** Tolerant parse back to typed readings — the q19 rules (short or
    * malformed lines dropped, never crashing the stream) with the
    * observe() counters attached under `gen_quality`: a streaming run
    * reads rows in/kept/dropped per micro-batch from
    * `StreamingQueryProgress.observedMetrics` — the reference
    * publisher's "{Sent:N}" counter, exact and distributed. */
  def parseReadings(lines: DataFrame): DataFrame =
    lines
      .withColumn("f", split(col("line"), ","))
      .withColumn("drop", length(col("line")) < 10 || size(col("f")) < 4)
      .observe("gen_quality",
        count(lit(1)).as("rows_in"),
        count(when(!col("drop"), 1)).as("rows_kept"),
        count(when(col("drop"), 1)).as("rows_dropped"))
      .filter(!col("drop"))
      .select(element_at(col("f"), 1).as("vin"),
        element_at(col("f"), 3).cast("double").as("accel"),
        element_at(col("f"), 4).cast("double").as("brake"))
}
