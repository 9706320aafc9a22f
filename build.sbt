ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dataclodspark"
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
// forked run output goes straight to stdout (no "[info] " logger
// prefix) so Bench's single JSON line is machine-parseable
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ... and suppress the trailing "[success] Total time: ..." banner so the
// JSON line is the LAST stdout line (driver parses the tail).
ThisBuild / showSuccess := false
// Real-engine federation e2e: extra JDBC drivers (duckdb, sqlite, ...) may
// sit in the pre-warmed local coursier cache; locate them by globbing the
// cache (hostname-free) or via GRAFT_EXTRA_TEST_JARS (path-separated list).
// No network resolution happens, so the offline rule holds. FederationSpec
// skips gracefully if a jar or its native lib is unavailable.
def extraJdbcJars: Seq[Attributed[File]] = {
  val cache = file(sys.props("user.home")) / ".cache" / "coursier"
  val globbed = Seq("duckdb_jdbc-*.jar", "sqlite-jdbc-*.jar", "postgresql-*.jar")
    .flatMap(p => (cache ** p).get())
  val fromEnv = sys.env.get("GRAFT_EXTRA_TEST_JARS").toSeq
    .flatMap(_.split(java.io.File.pathSeparator)).map(file).filter(_.exists)
  (globbed ++ fromEnv).distinct.map(Attributed.blank(_))
}
Test / unmanagedJars ++= extraJdbcJars
// ... and on the run classpath too: ScaleSmoke's federation leg reads a
// real DuckDB file through duckdb_scan (skipped when the jar is absent)
Runtime / unmanagedJars ++= extraJdbcJars
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
