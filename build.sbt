ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kafkas3etlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
  // The Kafka connector for graft.sinks.KafkaSink.write's default
  // format("kafka") path. NOT resolvable in this offline build (no jar in
  // /opt/spark/jars, none in the coursier cache; resolve re-attempted
  // rounds 6 through 10 — repo1.maven.org unreachable each time, DNS
  // still fails as of 2026-08-15 round 10) —
  // uncomment on a cluster with egress. Until then the connector
  // contract is enforced by KafkaLogSink.validateMessageSchema and
  // exercised end-to-end by the graft-kafka-log stand-in sink
  // (KafkaSinkSpec).
  // "org.apache.spark" %% "spark-sql-kafka-0-10" % "4.1.2",
)
Test / fork := true
run / fork := true
// Forked `run` output goes RAW to sbt's stdout/stderr, not through the
// sbt logger: the logger's "[info] " prefix is what made the driver's
// tail capture of Bench's final JSON line unparseable two rounds running
// ("parsed": null, round-9 verdict #2). StdoutOutput keeps Bench/Verify
// stdout byte-identical to what the program printed.
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
  // 16g default: 32 local executor threads + per-query broadcasts put
  // multi-second GC pauses into whichever bench query lands on them at 8g.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
) ++ sys.env.get("SPARK_GRAFT_GC").map(g => s"-XX:+Use${g}GC").toSeq
