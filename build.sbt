ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ingestprocessstoreinnrtspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output goes straight to stdout (no [info] prefix) so the
// driver can machine-parse Bench's single JSON line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Default heap targets BASELINE.md's environment (48 GiB — an 8g default
// made persist-heavy pipelines thrash; BENCH_r02 was ~3x baseline for
// exactly those queries) but is clamped to ~75% of detected physical RAM
// so smaller hosts degrade to a smaller heap instead of swap/OOM-kill.
// SPARK_DRIVER_MEM overrides the computed default either way.
val defaultHeapGb: Int = {
  def readLong(path: String, pick: String => Option[Long]): Option[Long] =
    try {
      val src = scala.io.Source.fromFile(path)
      try pick(src.mkString) finally src.close()
    } catch { case _: Throwable => None }
  def parseLong(s: String): Option[Long] =
    scala.util.Try(s.trim.toLong).toOption
  // host RAM from /proc/meminfo (kB)
  val hostGb = readLong("/proc/meminfo", s =>
    s.split("\n").collectFirst { case l if l.startsWith("MemTotal:") =>
      l.split("\\s+")(1).toLong / 1024 / 1024 })
  // cgroup limit (v2 then v1) — inside a memory-limited container
  // /proc/meminfo still shows HOST RAM, so the limit must win
  val cgroupGb = readLong("/sys/fs/cgroup/memory.max", s =>
      parseLong(s).map(_ / (1024L * 1024 * 1024)))
    .orElse(readLong("/sys/fs/cgroup/memory/memory.limit_in_bytes", s =>
      parseLong(s).map(_ / (1024L * 1024 * 1024))))
    .filter(g => g > 0 && g < 4096) // "max"/huge sentinel = no limit
  (hostGb.toSeq ++ cgroupGb.toSeq) match {
    case Nil => 48 // nothing readable (e.g. macOS) — explicit default
    case gs => math.min(48L, math.max(2L, gs.min * 3 / 4)).toInt
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", s"${defaultHeapGb}g")}",
)
