ThisBuild / scalaVersion := "2.13.17"
ThisBuild / scalacOptions += "-encoding"
ThisBuild / scalacOptions += "UTF-8"
ThisBuild / version := "0.1.0"
name := "planetilerspark"
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
// Pass forked program output through UNPREFIXED: the bench/verify
// mains print machine-readable JSON lines that downstream parsers read
// from stdout; sbt's default logger would prepend "[info] ".
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 32g default (was 8g): the render/encode path is allocation-heavy
  // and at 16+ local threads an 8g heap made G1 young collections the
  // dominant memory-bandwidth consumer (measured: the 16-thread render
  // stage burned 62 CPU-s at 8g vs 40 CPU-s at 32g for identical
  // work). The sandbox has 128 GiB; production clusters size executor
  // heaps per-node via spark.executor.memory instead — this default
  // only governs the local single-JVM harnesses and stays overridable.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
) ++ sys.env.getOrElse("SPARK_GC_OPTS", "-XX:+UseG1GC -XX:MaxGCPauseMillis=400")
  .split(" ").toSeq
