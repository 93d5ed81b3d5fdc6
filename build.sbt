ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "molochspark"
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
// Forked `runMain` output goes straight to sbt's own stdout/stderr instead
// of through the logger: the driver tail-parses Bench's JSON stdout line,
// and the logger's "[info] " prefix breaks a plain json-per-line parse.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// Quiet logging from JVM start for the driver-contract mains: Spark's
// SparkSession-creation INFO lines print before programmatic setLogLevel
// and have front-truncated Bench's JSON line out of the driver's bounded
// output tail. Scoped to `run` via system property (not a packaged
// src/main/resources config) so the library never overrides a consumer's.
run / javaOptions +=
  s"-Dlog4j2.configurationFile=${baseDirectory.value / "conf" / "log4j2-run.properties"}"
Compile / run / javaOptions +=
  s"-Dlog4j2.configurationFile=${baseDirectory.value / "conf" / "log4j2-run.properties"}"
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] runs driver+executors in one JVM: 32 ingest threads each
  // holding packet buffers plus query state need real headroom, and the
  // box has 128 GiB — 8g left the throughput segment GC-bound
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Throughput collector for the batch JVM: these are all-cores batch
  // sweeps with no latency SLO on the collector, and G1's concurrent
  // cycles tax the mutator. Paired A/B at sf0.1/32 cpus (min-of-2
  // sweeps, two runs each): G1 79.6 s -> ParallelGC 72.7 s total,
  // median per-query ratio 0.92; the only consistent losers are the
  // broadcast-iterative s-family (~+0.2 s each), far outweighed.
  "-XX:+UseParallelGC",
)
