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
  // an allocation-heavy workload with a huge young gen). 16g held
  // through r6; the r7 session (323 queries + the regenerated, heavier
  // sf0.1 data) brought the phantom mode back at 16g (a12_ols_group
  // 0.2 s isolated -> 2.8 s in-session, smote 5 s -> 12 s). 24g clears
  // it (measured full-session A/B in r7, BENCH_NOTES.md) without
  // triggering the 48g large-young-gen penalty.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
