ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "queryenginespark"
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
)
// FIXED, PRE-TOUCHED heap: with the default tiny -Xms, G1's lazy heap
// growth under allocation-heavy stages (window sorts, hash aggs) cost
// 100-270 s of GC per heavy query and swung identical runs 2-8x —
// the round-13 NND A/B measured 298 s -> 42 s from this flag pair
// alone. Benchmarks are uninterpretable without it. Scoped to run/bench
// ONLY (round-13 advice): a project-level -Xms8g -XX:+AlwaysPreTouch
// also made every forked Test JVM commit and pre-touch 8 GiB up front —
// slow suite startup, and an outright launch failure on small hosts.
// Tests measure correctness, not time; they get a capped lazy heap.
run / javaOptions ++= Seq(
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
)
// builder-local profiling hook (e.g. -XX:+PrintCompilation for the q196
// warm-floor investigation); empty in every driver invocation
run / javaOptions ++= sys.env.get("SPARK_GRAFT_EXTRA_JVM_OPTS")
  .map(_.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
Test / javaOptions ++= Seq(
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
