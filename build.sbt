ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "samsaspark"
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
// The round driver json-parses the last 2 kB of `runMain graft.Bench`
// stdout. The default forked outputStrategy (LoggedOutput) prefixes
// every line with "[info] ", which defeats that parse (BENCH_r10-r12
// all recorded parsed:null). Raw StdoutOutput passes the child's
// stdout through undecorated, and showSuccess=false drops the trailing
// "[success] Total time" banner so Bench's compact JSON line is the
// genuinely last line of stdout. showSuccess is only consulted at the
// global scope when sbt prints the banner, and the bench driver's sbt
// invocation is fixed (we cannot append `set` commands to it), so the
// GLOBAL suppression here is intentional — it also silences the banner
// for interactive `sbt test`/`compile`, a cost we accept; task results
// still report via the usual [info]/[error] lines.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
  // Deeply-cached composite pipelines (ext/CorpusBuild) nest
  // InMemoryRelations whose explain strings grow multiplicatively —
  // AQE renders the plan string on every plan update, which can OOM the
  // driver on a string that exists only for logging. Bound it (standard
  // production-cluster practice; correctness/PlanSpec plans are far
  // below this cap).
  "-Dspark.sql.maxPlanStringLength=1000000",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
