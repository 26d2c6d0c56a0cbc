ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cloudfloespark"
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
// Forked run output normally flows through sbt's logger, which prefixes
// every line with "[info] " — that prefix breaks line-oriented JSON
// consumers tailing the log (graft.Bench's final summary line). Inherit
// the parent stdout instead so program output is emitted verbatim.
run / connectInput := true
outputStrategy := Some(StdoutOutput)
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
  // 16g: a 127-query repeat=2 bench accumulates listener/aggregate heap
  // across runs; at 8g the tail of the run GC-thrashes (measured: p79
  // repeat-3 degraded 5.5 -> 25.6 s at 8g, steady 1.8-3.1 s at 24g on
  // the same data) and load-inflates the recorded numbers. The machine
  // budget is 128 GiB; size the one JVM like an executor would be.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
