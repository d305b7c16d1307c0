ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "project2semanticsimilarityspark"
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
// Forked run output goes straight through, unprefixed — the bench
// harness parses the JSON line from stdout and sbt's logger would
// otherwise decorate it with "[info] ".
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// … and sbt must not print "[success] Total time: …" AFTER that JSON
// line: the harness reads the last line of stdout (BENCH_r02 recorded
// parsed:null with the JSON intact but followed by the [success] line).
Global / showSuccess := false
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
  // 16g: at 8g the 104-query bench GC-churns (measured 59–74 s run
  // totals vs a stable 51–54 s at 16g — codegen classes + broadcasts +
  // 32-thread shuffle buffers accumulate heap pressure); the box has
  // 128 GiB, and SPARK_DRIVER_MEM still overrides.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // pre-size the heap ONLY for harness-driven bench/verify runs (they
  // export SPARK_GRAFT_SF_DIR) or when SPARK_DRIVER_XMS asks for it:
  // growing 512m → 16g mid-bench costs several stop-the-world resizes
  // that land on random queries, but an unconditional -Xms16g would
  // fail every sbt fork on a host with <16 GiB free (r5 ADVICE).
  s"-Xms${sys.env.get("SPARK_DRIVER_XMS")
    .orElse(sys.env.get("SPARK_DRIVER_MEM"))
    .getOrElse(if (sys.env.contains("SPARK_GRAFT_SF_DIR")) "16g" else "512m")}",
)
