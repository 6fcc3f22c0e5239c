ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "industrialdatapipelinespark"
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
// pass the forked main's stdout through UNPREFIXED: the Bench contract is
// "print ONE JSON line" and sbt's default LoggedOutput would re-log it as
// "[info] {...}", which a line-oriented json.loads consumer can't read
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // dozens of codegen'd stages per run: the 240m default code cache
  // fills and flips hot paths back to the interpreter mid-benchmark.
  // Re-raised 512m -> 768m at 244 queries: the A/B showed the
  // mid-suite graph family (peak churn) losing 2-3s per cell to cache
  // pressure at 512m (BENCH_SCALE.md round-8 addendum).
  "-XX:ReservedCodeCacheSize=768m",
)

// Dev-probe mains (DevSpot, ProfileQuery) live in their own source set:
// they are load-bearing A/B tooling (every BENCH_SCALE kernel table
// comes from them) but not part of the library surface a published
// artifact would ship. Kept on the Compile classpath so
// `runMain graft.DevSpot ...` keeps working from one output directory;
// excluding them from a published jar is one mappings filter away.
Compile / unmanagedSourceDirectories += baseDirectory.value / "tools-src" / "scala"
