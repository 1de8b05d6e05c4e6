ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pyropespark"
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
  // 32g default: the bench's 10M-vector rung holds ~5.3 GB of packed
  // lists + ~5 GB of columnar cache in one local-mode JVM
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // Xms = Xmx so G1 never uncommits heap: this host (a microVM) serves
  // guest first-touch page faults from the HOST side, and the fault
  // path COLLAPSES under concurrency — measured 2026-08: ~7 us/page
  // with one faulting thread, ~500 us/page with 32 executor threads
  // faulting at once (aggregate throughput FALLS 137k -> 25k pages/s),
  // which is exactly the intermittent 80-97%-sys storms the bench's
  // ownsys_* channel attributes (NOTES_r14 §2). A committed-equal-to-
  // max heap never returns pages on the bench's drain System.gc(), so
  // once-faulted heap stays faulted. NOT -XX:+AlwaysPreTouch: the
  // JVM pre-touches with all ParallelGCThreads at once and hits the
  // same collapse (measured: 8.7 min wall / 150 min sys to start one
  // 32g JVM) — measurement mains instead self-pace a 2-thread touch
  // at the fast sequential rate (Bench.preTouchHeap).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
