ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "relikspark"
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
// Pass forked-run stdout through verbatim: the driver machine-parses the ONE
// JSON line graft.Bench prints, and sbt's default LoggedOutput prefixes every
// line with [info] (BENCH_r01 came back `parsed: null` because of it).
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
Compile / runMain / outputStrategy := Some(StdoutOutput)
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
  // G1 explicitly: ParallelGC hit 30s stop-the-world full collections on the
  // 28g heap (52s total pause in a 113s run); G1 keeps total pause ~1-2s
  "-XX:+UseG1GC",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "28g")}",
)
// Fixed, pre-touched heap for benched runs: this Firecracker guest burns
// 75-90% CPU in the kernel when the JVM commits/uncommits heap pages at
// runtime (munmap/madvise => TLB-shootdown IPIs across all 32 vCPUs;
// measured 178s vs 13s wall on an identical job). Tests keep a growable
// heap — pre-touching 28 GB per test JVM wastes startup time.
Compile / run / javaOptions ++= Seq(
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "28g")}",
  "-XX:+AlwaysPreTouch",
)
Compile / run / envVars += "MALLOC_ARENA_MAX" -> "2"
Test / envVars += "MALLOC_ARENA_MAX" -> "2"
