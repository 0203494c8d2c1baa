ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "prawetlstudentdropoutspark"
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
// pass the forked program's stdout through UNPREFIXED: the bench/verify
// mains print one machine-readable JSON line, and sbt's default logger
// would wrap it as "[info] {...}", breaking line-oriented parsers
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
  // 16g of a 128g box: headroom against GC thrash when the driver runs
  // other JVMs concurrently (round-1 bench showed 100x query-time outliers
  // under memory pressure that never reproduce in isolation)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // whole-stage codegen mints UNIQUE classes per execution (expression
  // ids differ), so a 123-query × 3-rep run JIT-compiles thousands of
  // one-shot methods. Headroom over the JDK-17 default 240m keeps code
  // cache flushing out of the picture for long sessions (telemetry via
  // Probe121: ~130M used after 366 executions, so the default sits at
  // >50% and climbs). Reserved ≠ committed — only used pages cost RAM.
  "-XX:ReservedCodeCacheSize=1g",
)
