ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "marketflowspark"
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
// Forked `run` output goes straight to this process's stdout instead of
// through sbt's logger — Bench/Verify print machine-parsed JSON lines and
// the logger's "[info] " prefix breaks downstream parsers.
run / outputStrategy := Some(sbt.OutputStrategy.StdoutOutput)
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
  // 24g default: the 80-query bench in one local[32] JVM accumulates
  // plans/broadcasts, and the shingle-heavy dedup queries showed 3-5x
  // run-to-run spread from GC churn at 8g (the box has 128 GiB)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // 86 codegen'd queries x (2 warm passes + 3 measured rounds) in one
  // JVM generate far more compiled code than the 240m default reserve;
  // a full code cache disables the JIT mid-suite and the remaining
  // queries run interpreted — which reads as a uniform ~25% "regression"
  "-XX:ReservedCodeCacheSize=512m",
)
