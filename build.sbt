ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "giscitycountyspark"
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
// Forked run output must NOT pass through sbt's logger: the logger
// prefixes every line with "[info] ", which breaks machine parsing of
// Bench's single-line JSON. StdoutOutput = child inherits stdout.
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
  // Scratch I/O (shuffle spill dirs, streaming temp checkpoints —
  // offset/commit logs and state-store delta files fsync per
  // micro-batch) on tmpfs instead of the disk-backed /tmp: the 13
  // streaming sweep entries pay StreamingQuery lifecycle cost per rep,
  // ~15-25% of which measured as checkpoint-dir I/O latency on this
  // box. Standard fast-local-dir practice (a production cluster puts
  // spark.local.dir on local NVMe); the engine under test is unchanged.
  // The dir is created at sbt load (below) — a forked JVM does NOT
  // create its java.io.tmpdir and would fail on first temp file.
  "-Djava.io.tmpdir=/dev/shm/graft_tmp",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // A full verify/bench sweep JIT-compiles hundreds of distinct
  // whole-stage-codegen classes; the JDK 17 default 240 MB code cache
  // fills, the sweeper starts evicting HOT methods, and random stages
  // intermittently run interpreted at 15-30x CPU (observed: the same
  // 32-task stage at 8.6 s then 127 s executor time within one JVM).
  // 1g sufficed through r9's 138 entries; r10's 150-entry sweep
  // recorded the same eviction fingerprint again (x68 at 7x CPU on
  // byte-identical code, normal in isolation), so 2g — Bench now
  // records per-pool occupancy in bench_detail.json to make this
  // class of regression self-diagnosing.
  "-XX:ReservedCodeCacheSize=2g",
  // Commit and zero the whole heap at JVM startup instead of lazily
  // on first touch. On driver-sized heaps (~64-90 GiB) lazy paging
  // charged multi-second kernel zeroing + THP work to whichever bench
  // entry happened to be running — DIFFERENT entries at up to 10x CPU
  // per run on identical code, the r10 x68 / r11 x77 "regressed on
  // identical code" anomaly shape. Measured at 64g: 263.8 and 179.9
  // CPU-s sweeps with rotating 10x entries without this flag; 131.9
  // CPU-s (8g-equivalent, zero flagged) with it. Standard large-heap
  // practice; the one-time pre-touch cost lands at startup, outside
  // every timed region.
  "-XX:+AlwaysPreTouch",
) ++
  // dev experiment hook: extra JVM flags for the forked mains without
  // editing the build (e.g. GC-attribution runs at driver-sized heaps)
  sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq
    .flatMap(_.split("\\s+").filter(_.nonEmpty))

// Forked JVMs get -Djava.io.tmpdir=/dev/shm/graft_tmp (above); the JVM
// does not create a missing tmpdir, so guarantee it exists the moment
// the build loads — tmpfs is cleared on every boot.
Global / onLoad := {
  val prev = (Global / onLoad).value
  prev.andThen { s =>
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("/dev/shm/graft_tmp"))
    s
  }
}
