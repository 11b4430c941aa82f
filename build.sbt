ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "jobminerspark"
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
// Forked run output passes straight through to stdout/stderr instead of
// going through sbt's logger: the logger prefixes every line with
// "[info] ", which makes Bench's machine-readable JSON line unparseable
// to anything expecting a bare `{...}` line.
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
// Pinned bench JVM (r07): fixed heap (-Xms == -Xmx, no growth pauses mid
// rep) and an explicit collector, so builder and driver bench runs share
// memory behavior instead of inheriting whatever the host JVM defaults to.
// Recorded in BENCH_HISTORY.md; change both together or minima drift.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+UseG1GC",
  "-XX:MaxGCPauseMillis=200",
  // r08: a 253-query sequential bench generates enough wholestage-codegen
  // classes to fill the default 240 MB JIT code cache, after which the JVM
  // stops compiling and every HOF/automaton-heavy query runs interpreted
  // (the r07 driver-bench doc_winnowing 46.9s-vs-1.7s signature). Pin it
  // high; Bench prints per-query occupancy so a recurrence is visible.
  "-XX:ReservedCodeCacheSize=1g",
)
