ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "predictinghospitalreadmissionusingmimicdatabasespark"
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
  // 16g default — measured both failure modes on the 128 GiB box:
  // at 8g the ~300-query bench session accumulates enough live state
  // that the 900-tree RF fit GC-thrashes late in the run (36 s isolated
  // -> 96 s in-session, with multi-second phantom regressions on
  // neighboring queries — the r5 ev_stream_attribution mystery); at 48g
  // the SAME fit is 3x slower even isolated (110.9 s vs 36.2 s — G1 on
  // an allocation-heavy workload with a huge young gen). 16g reproduces
  // the 8g isolated fit time (37.3 s, 3 tight reps) with session
  // head-room.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
