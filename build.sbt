ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "postgresmlspark"
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
// Forked run output goes straight to this process's stdout/stderr,
// NOT through sbt's logger: the driver parses graft.Bench's one JSON
// line from captured stdout, and sbt's "[info] " decoration made the
// artifact unparseable three rounds running (r14-r16 "parsed": null).
run / outputStrategy := Some(StdoutOutput)
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
) ++
  // scale-headroom runs: the driver-local ANN tiers collect GB-class blob
  // sets (the sf100 condition) — forward a raised collect ceiling
  sys.env.get("SPARK_DRIVER_MAX_RESULT").toSeq
    .map(v => s"-Dspark.driver.maxResultSize=$v") ++
  // extra JVM flags for scale runs (e.g. SPARK_GRAFT_JVM_OPTS=
  // "-XX:+UseParallelGC": G1's humongous machinery wedged the JVM at a
  // safepoint under GB-class blob allocation in the 1024-d 5M build)
  sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq
    .flatMap(_.split("\\s+").filter(_.nonEmpty)) ++
  // forward graft.* tuning props (e.g. -Dgraft.lsh.inlineVerifyMaxBytes=0)
  // into the forked run/test JVMs
  sys.props.toSeq.collect { case (k, v) if k.startsWith("graft.") => s"-D$k=$v" }
