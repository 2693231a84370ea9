ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "selfhostedragdocchatprototypespark"
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
// The driver archives a ~2KB tail of the bench's stdout and parses the
// LAST line as JSON. sbt's default LoggedOutput wraps the forked run's
// stdout with "[info] " (and its stderr with "[error] "), and sbt
// itself appends "[success] Total time: ..." after the run — both of
// which have made every BENCH_rNN artifact read "parsed": null.
// StdoutOutput passes the forked JVM's stdout/stderr through raw;
// showSuccess drops the trailing [success] line. Exit codes (the
// compile/test gates) are unchanged.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
) ++
  // Extra JVM flags for forked runs (GC experiments on the large-SF
  // probes — e.g. SPARK_GRAFT_JVM_OPTS="-XX:+UseParallelGC").
  // Split on whitespace by DESIGN: the documented use is single
  // -XX:/-D flags; a flag whose VALUE contains spaces would need a
  // shell-style tokenizer — not supported, pass such flags by
  // editing this file instead (r13 advice, accepted limitation).
  sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq
    .flatMap(_.trim.split("\\s+").toSeq.filter(_.nonEmpty))
