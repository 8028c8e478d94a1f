ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "greenmaskspark"
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
// forked run output passes through unprefixed — Bench prints ONE bare
// JSON line on stdout and a logger prefix ("[info] ...") would break any
// line-oriented parser reading it
run / outputStrategy := Some(StdoutOutput)
// ... and the trailing "[success] Total time" banner would land AFTER that
// JSON line, so a parser reading the last line would still miss it
Global / showSuccess := false
// showSuccess is read by sbt's command engine, not a task — exclude it
// from the unused-key lint so runs stay warning-free
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
)
// dev A/B lever: extra -D flags for the forked JVM, e.g.
//   SPARK_GRAFT_RUN_OPTS="-Dspark.graft.widen.minBytes=9223372036854775807"
// flips a graft conf without touching code (SparkConf loads spark.*
// system properties; session SQLConf snapshots them at creation). The
// driver never sets it — default behavior is byte-identical.
javaOptions ++= sys.env.get("SPARK_GRAFT_RUN_OPTS")
  .map(_.trim.split("\\s+").toSeq).getOrElse(Nil)
