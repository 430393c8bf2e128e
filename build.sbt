ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pg2kinesisspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")

// Root project made explicit so the live-transport adapters compile in
// CI. `compile`/`test` aggregate into `adapters`; `run`/`runMain` must
// NOT (the driver invokes `runMain graft.Bench` etc. at root, and an
// aggregated runMain would also fire in adapters, which has no mains).
lazy val root = (project in file("."))
  .aggregate(adapters)
  .settings(
    run / aggregate := false,
    Compile / runMain / aggregate := false,
  )

// Production transports for a real Postgres walsender (pgjdbc) and real
// AWS Kinesis. The runtime deps (org.postgresql:postgresql,
// software.amazon.awssdk:kinesis) are unresolvable offline, so the
// sources compile against compile-only shims of exactly the API slice
// they touch (extras/shims/ — package/method mirrors that never run).
// Deploying for real: drop the shims directory from
// unmanagedSourceDirectories and add the two real jars. The shim
// classes live only on this subproject's classpath — the library
// artifact stays clean of fake org.postgresql/software.amazon classes.
// one resolution point for the real-clients switch so the source-dirs
// and jars settings can never drift apart
lazy val realClients: Boolean =
  sys.props.get("graft.realClients").exists(_.toBoolean) ||
    sys.env.get("GRAFT_REAL_CLIENTS").exists(v => v == "1" || v == "true")

lazy val adapters = (project in file("extras"))
  .dependsOn(LocalProject("root"))
  .settings(
    name := "graft-adapters",
    unmanagedBase := file("/opt/spark/jars"),
    // -Dgraft.realClients=true (or GRAFT_REAL_CLIENTS=1): compile the
    // adapters against REAL client jars instead of the shims — drop
    // org.postgresql:postgresql and software.amazon.awssdk:kinesis
    // (+ transitive core/auth/http jars) into extras/lib/ and run
    //   sbt -Dgraft.realClients=true adapters/compile
    // The shim sources leave the classpath entirely, so any drift
    // between the shim mirrors and the real pgjdbc/AWS API surfaces
    // fails this compile — the CI job that keeps the seam honest.
    // (Unset — this zero-egress sandbox — the shims stand in.)
    Compile / unmanagedSourceDirectories := {
      val adapterDirs = Seq(
        baseDirectory.value / "pgjdbc-adapter",
        baseDirectory.value / "kinesis-adapter",
      )
      if (realClients) adapterDirs
      else (baseDirectory.value / "shims") +: adapterDirs
    },
    Compile / unmanagedJars ++= {
      if (realClients) ((baseDirectory.value / "lib") * "*.jar").classpath
      else Seq.empty
    },
  )
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked program output goes straight to stdout/stderr (no sbt [info]
// prefix) so Bench's single JSON line is machine-parseable.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// No "[success] Total time: ..." epilogue after the program exits —
// Bench's JSON line must be the LAST line of sbt's combined output
// (round-2 bench output was unparseable because of this line).
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // The query surface whole-stage-codegens several hundred classes per
  // session; the JVM's default 240 MB code cache then churns (sweeping
  // evictions + recompiles, no "cache full" warning) and an arbitrary
  // subset of queries runs interpreted-speed for the whole session —
  // the standard Spark codegen tuning is a larger reserved code cache.
  // 512m still churned on the full 89-query surface (isolated runs of
  // the same queries were 2-5x faster than their full-surface numbers);
  // 1g costs nothing at 128 GiB RAM.
  "-XX:ReservedCodeCacheSize=1g",
)
