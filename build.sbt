ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tsodspark"
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
// The driver parses the LAST stdout line of `sbt runMain graft.Bench`
// as JSON. Two pieces of sbt log framing defeated that for five rounds:
// (1) forked-process stdout is re-logged with an "[info] " prefix under
// the default LoggedOutput strategy — StdoutOutput passes the child's
// stdout through verbatim; (2) sbt appends "[success] Total time: ..."
// as the true final stdout line — showSuccess := false removes it.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command loop, not a task — exclude it
// from the unused-setting lint so the warn doesn't precede bench output.
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
  // Fixed, pre-touched heap: G1's default grow-and-uncommit behavior
  // re-faults heap pages all run long, and on an aged host those
  // first-touch faults arrive as multi-second whole-JVM stall windows
  // (reproduced with a constant job: median 0.99s with 3-7s spikes →
  // flat 0.46s with Xms=Xmx + AlwaysPreTouch). The one-time pre-touch
  // (~45s for 16g) happens at JVM start, outside any timed region —
  // exactly how a real executor would be sized (fixed heap per host).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  "-XX:+AlwaysPreTouch",
)
// escape hatch for GC logging / tuning experiments without editing the build
javaOptions ++= sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(
  _.split(" ").filter(_.nonEmpty))
