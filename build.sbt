ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "conectaspark"
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
// The driver reads the bench/verify result from the TAIL of combined sbt
// output and parses the bench JSON from its last line. Two settings make
// that line reach the driver bare: StdoutOutput passes the forked JVM's
// stdout/stderr through UNPREFIXED (the default LoggedOutput wraps every
// line in "[info] " / "[error] ", which is not valid JSON), and
// showSuccess := false suppresses the "[success] Total time: ..." line
// sbt would otherwise print AFTER the program's final output.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command engine, not by another setting —
// exclude it from the unused-key lint (verified working: no [success]
// line follows the bench JSON).
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
  // 8g, deliberately NOT larger: with -Xmx32g, G1 lets eden balloon to
  // ~19 GB between collections and individual young GCs then stall all
  // 32 task threads for seconds at random points — the same query
  // measured 3 s to 28 s run-to-run at 32g vs a stable 3-7 s at 8g.
  // Spark tasks are allocation-heavy but short-lived; a small heap with
  // frequent cheap young GCs is the stable configuration.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // A 50+-query suite generates hundreds of Janino classes (one per
  // codegen stage, × warm+timed passes). The default 240 MB code cache
  // fills mid-suite and triggers flush/recompile churn — late queries
  // then time 5-15× their solo cost, at random. 1 GB fits the suite.
  "-XX:ReservedCodeCacheSize=1g",
) ++ sys.env.get("SPARK_GRAFT_GCLOG").toSeq.map(f => s"-Xlog:gc:$f"
)
