ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mobilitydatalakebenchmarkspark"
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
// Forked program stdout must pass through UNDECORATED: the bench/verify
// mains emit one machine-parseable JSON line as their final output, and
// sbt's default logger wraps forked stdout as "[info] {...}" (and forked
// stderr as "[error] ..."), which defeats any line-oriented JSON parser
// reading the sbt process's stdout (BENCH_r13/r14 `parsed: null`).
// StdoutOutput inherits the parent's raw stdout/stderr instead.
outputStrategy := Some(StdoutOutput)
run / outputStrategy := Some(StdoutOutput)
// ...and suppress the "[success] Total time: ..." footer sbt appends
// after the program exits, so the program's own final line stays the
// last line of stdout.
Global / showSuccess := false
// showSuccess is consumed by the command loop, not a task — silence the
// unused-key lint
Global / excludeLintKeys += showSuccess
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // the full bench runs 350+ codegen-heavy workloads in ONE JVM: the
  // JDK default 240m code cache fills partway through and the JIT stops
  // compiling new generated classes, which aged the back half of the r9
  // sweep ~1.2-3x (flagged queries returned to their r8 times in a
  // fresh-JVM subset run with identical shuffle bytes — BUILDER_NOTES
  // round 10). 1g keeps whole-stage codegen compiled end to end.
  "-XX:ReservedCodeCacheSize=1g",
)
