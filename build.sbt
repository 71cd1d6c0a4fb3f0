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
  val physGb =
    try {
      val src = scala.io.Source.fromFile("/proc/meminfo")
      try src.getLines()
        .collectFirst { case l if l.startsWith("MemTotal:") =>
          (l.split("\\s+")(1).toLong / 1024 / 1024).toInt }
        .getOrElse(Int.MaxValue)
      finally src.close()
    } catch { case _: Throwable => Int.MaxValue }
  math.min(48, math.max(2, physGb * 3 / 4))
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", s"${defaultHeapGb}g")}",
)
