ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dataservicespark"
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
// The driver parses the bench's one-line JSON from captured stdout; the
// default LoggedOutput strategy wraps every forked line in sbt's
// "[info] " prefix, which broke that parse two rounds running
// (PERF_r17/r18 `parsed: null`). StdoutOutput inherits the raw stdout
// fd, and hiding the "[success] Total time" epilogue keeps the JSON as
// the last line of the run.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += run / outputStrategy
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
) ++ sys.env.get("SPARK_GRAFT_GC_LOG").map(f => s"-Xlog:gc:file=$f").toSeq

// ExtensionsSpec must build the FIRST session in its JVM to prove the
// spark.sql.extensions config-string injection path — in the shared
// test JVM, getOrCreate() would return the already-built session and
// the test would be vacuous. Give it its own forked group.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / forkOptions).value
  val (iso, rest) = tests.partition(_.name.endsWith("ExtensionsSpec"))
  Seq(
    Tests.Group("extensions-isolated", iso, Tests.SubProcess(opts)),
    Tests.Group("main", rest, Tests.SubProcess(opts)),
  ).filter(_.tests.nonEmpty)
}
