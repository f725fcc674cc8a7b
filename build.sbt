ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sumspark"
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
  // 8g proved too small once the suite reached 95 queries: family
  // artifacts + shuffle/codegen overhead push the old-gen high enough
  // that mid-suite queries measured GC schedule, not plan cost. The box
  // has 128 GiB; 24g leaves ample room for the driver-side oracle stack.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // The 234-query suite JITs ~200 MB of nmethods (measured with
  // -XX:+PrintCodeCache at suite end: profiled 108 MB + non-profiled
  // 91 MB) — the JDK default 240 MB reserve leaves the profiled segment
  // ~95% full, and once code-cache flushing starts, hot generated code
  // is swept and deoptimized mid-suite: random late-suite queries
  // re-measure interpreter cost at 10-50x plan cost, moving between
  // runs as sweep order changes (the same signature as the round-3/5
  // codegen-cache LRU disease, one layer down). 512 MB keeps the
  // segments under half full at the current surface; like
  // spark.sql.codegen.cache.maxEntries, it must scale with the surface.
  "-XX:ReservedCodeCacheSize=512m",
) ++
  // Optional scratch relocation (A/B harness knob): streaming temp
  // checkpoints and Spark local dirs live under java.io.tmpdir; pointing
  // it at a tmpfs (e.g. /dev/shm/graft-tmp) isolates inherent state-store
  // cost from checkpoint-file IO scheduling. Local measurement only — a
  // cluster deployment checkpoints to durable storage.
  sys.env.get("SPARK_GRAFT_TMPDIR").toSeq.map(d => s"-Djava.io.tmpdir=$d")

// Forward stdin to forked `run` mains (the graft.Cli REPL reads it).
run / connectInput := true
