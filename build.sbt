ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sahithimetamorphetlspark"
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
// Forked-run output goes straight to this process's stdout/stderr with no
// "[info] " log prefix — the bench driver parses Bench's single JSON line
// from stdout and sbt's prefix would break that.
run / outputStrategy := Some(StdoutOutput)
// ...and suppress sbt's "[success] Total time: ..." epilogue: the bench
// driver reads the LAST stdout line, and in rounds 1-2 that epilogue
// landed after Bench's JSON and the driver recorded parsed:null.
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
  // 48g: local[32] means 32 concurrent tasks sharing this ONE heap —
  // percentile buffers, broadcast builds, and sort pages across 32
  // threads overflow 8g and the bench then measures GC, not the plan
  // (observed: 20-30s outliers on percentile-heavy queries that run in
  // 1-3s with headroom). The bench host has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
