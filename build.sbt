ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "singerspark"

// Explicit root so the adapter-check subproject below is NOT aggregated
// into the default compile/test path (it is an on-demand bit-rot check).
lazy val root = (project in file("."))

// `sbt adapterStubCompile` typechecks tools/adapters (the live
// kafka/pulsar client seam half, unbuildable here: zero egress, no client
// jars) against embedded public-API stubs in tools/adapter-stubs — so a
// signature drift in the seams (EpochProducer, BrokerAdmin, …) or a stale
// client call is caught without network. Runtime use of the stubs is
// impossible (every body throws).
lazy val adapterCheck = (project in file("tools/adapter-check"))
  .dependsOn(root)
  .settings(
    unmanagedBase := file("/opt/spark/jars"),
    Compile / unmanagedSourceDirectories := Seq(
      (ThisBuild / baseDirectory).value / "tools" / "adapters",
      (ThisBuild / baseDirectory).value / "tools" / "adapter-stubs"),
  )
addCommandAlias("adapterStubCompile", "adapterCheck/compile")
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
// The bench contract requires the ONE JSON line graft.Bench prints to be
// the final stdout line of the invoking process; sbt's "[success] Total
// time ..." trailer lands AFTER the forked program's output and has made
// the driver's bench parser return null every round (BENCH_r*.json all
// carry `"parsed": null` with the trailer as the last stdout line).
// Suppress the trailer globally — build/test failures still report
// normally through [error] lines and the exit code. Also route the forked
// run's stdout STRAIGHT through (no "[info] " logger prefix — whether sbt
// prefixes depends on the invoking terminal, and a prefixed JSON line does
// not parse).
Global / showSuccess := false
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
  // 8g measured FASTER than 16/30/32g for the ingestion slices on this
  // container (bigger heaps = slower young-gen cycles for the allocation-
  // heavy decode paths; 32g additionally loses compressed oops) — and it
  // keeps bench numbers comparable across rounds.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Distinct codegen'd queries overflow the default 240m code cache,
  // silently degrading late queries to interpreter speed (the JIT disables
  // itself when full). 512m was enough for r2's ~65 queries; the ~105-query
  // surface ×2 bench iterations needs more — measured: with 512m the full
  // bench run degrades every query after the ~90th to 5-50× (q16 36s vs
  // 0.4s), with 1g the whole run stays at isolated-run speed.
  "-XX:ReservedCodeCacheSize=1g",
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.split("\\s+").toSeq)
