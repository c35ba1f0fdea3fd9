ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vnavcspark"
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
// Pass the forked JVM's stdout through UNprefixed: the driver parses the
// bench's single JSON line from stdout, and sbt's default logger wraps
// every forked-process line in "[info] " (BENCH_r02/r03 "parsed": null).
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // One-shot query workloads: C2 JIT storms over janino-generated classes
  // cause multi-10s nondeterministic stalls (measured 3-6x on bench);
  // C1-only trades ~15% steady-state for bounded, predictable runs.
  "-XX:TieredStopAtLevel=1",
  // C1-only halves the default cache, and janino emits a class per stage:
  // the 48 MB default fills mid-suite and the JVM DISABLES compilation
  // ("CodeCache is full" in the r4 test run) — everything after runs
  // interpreted, which is exactly the nondeterministic slowdown the C1
  // pin was meant to remove.
  "-XX:ReservedCodeCacheSize=256m",
)
