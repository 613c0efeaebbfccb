ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tapsspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// Second REAL JDBC engine for the cross-engine round-trip tests (taps'
// core promise is cross-engine moves): the DuckDB JDBC driver already
// sitting in the pre-warmed local cache, attached as an unmanaged TEST
// jar (no resolution — the zero-egress build cannot be broken by it;
// JdbcDuckDbSpec `assume`s the driver class and cancels cleanly if the
// jar is absent).
Test / unmanagedJars ++= {
  val cache = file(sys.props("user.home")) / ".cache" / "coursier"
  val found = if (cache.exists) (cache ** "duckdb_jdbc-*.jar").get else Seq.empty
  found.headOption.map(Attributed.blank(_)).toSeq
}
Test / fork := true
run / fork := true
// The per-round bench harness parses the LAST stdout line as JSON. Two sbt
// behaviors break that: forked-run output is re-logged with an "[info] "
// prefix, and sbt prints "[success] Total time: ..." AFTER the program's
// output. Inherit stdout directly (no prefix) and suppress the epilogue so
// graft.Bench's compact JSON line is the final line on stdout.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / showTiming := false
// consumed by sbt's command layer, not by tasks — exclude from unused lint
Global / excludeLintKeys ++= Set(showSuccess, showTiming)
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
  // 302 distinct queries × generated classes × adaptive warm-up passes
  // press the default 240 MB code cache; when the non-profiled-nmethods
  // heap fills, C2 stops compiling and the compute-dense codegen'd
  // kernels run 3-7× slower for the REST of the sitting (the r14 bench
  // artifact's in-JVM degradation class). 512 MB gives the marathon
  // headroom; SPARK_GRAFT_CODECACHE=48m is the synthetic-pressure knob
  // that validates the cpu-envelope poison gate.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_GRAFT_CODECACHE", "512m")}",
)
