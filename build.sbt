ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "jsonldnetspark"
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
  // Fixed, pre-touched heap: on this virtualized host, demand-paging a
  // growing heap serializes all executor threads on the process mm lock
  // (measured: 32-thread runs burning ~46% kernel time at <5 cores of
  // useful work). Pre-touching moves those faults out of the timed region.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
) ++ (
  // Throughput collector by default (round 5): the per-document pipeline
  // is allocation-heavy, and with 32 task threads filling one G1 heap the
  // collector costs ~half the run — measured on both the no-Spark probe
  // (ThreadScaleProbe 32t: 499k -> 1,087k pages/s) and the interleaved
  // full-pipeline A/B (G1 median ~1.0M t/s vs ParallelGC ~1.6M, best
  // 2.05M). A GC named in EXTRA_JAVA_OPTS takes precedence (conflicting
  // -XX:+Use*GC flags abort the JVM, so only add the default when unset).
  if (sys.env.get("EXTRA_JAVA_OPTS").exists(_.contains("GC"))) Seq()
  else Seq("-XX:+UseParallelGC")
) ++ sys.env.get("EXTRA_JAVA_OPTS").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
