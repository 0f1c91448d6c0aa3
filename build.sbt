ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dbtgluespark"
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
// HiveFormatSpec needs spark.sql.catalogImplementation=hive, a STATIC
// conf fixed at first-session creation per JVM — fork it into its own
// test JVM so the main suites keep the in-memory catalog. Both groups
// inherit the full javaOptions (add-opens etc.).
Test / testGrouping := {
  val tests = (Test / definedTests).value
  // Inherit the FULL default fork options (envVars, workingDirectory,
  // javaHome, output strategy) — a bare ForkOptions().withRunJVMOptions
  // would silently drop any future Test/envVars for every suite.
  val fo = (Test / forkOptions).value
  val (hive, rest) = tests.partition(_.name.contains("HiveFormatSpec"))
  Seq(
    new Tests.Group("graft", rest, Tests.SubProcess(fo)),
    new Tests.Group("hive-catalog", hive, Tests.SubProcess(fo)),
  ).filter(_.tests.nonEmpty)
}
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
  // The sandbox is a 128 GiB box running local[32]; an 8 GiB heap put the
  // full-suite bench on a memory cliff (r08 postmortem). 32 GiB leaves
  // ample headroom for the OS page cache while keeping GC pauses sane.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
) ++
  // Ephemeral JVM temp space (streaming temp checkpoints / state stores,
  // scratch parquet, temp warehouses) on the fastest device available —
  // the sandbox's virtio disk intermittently throttles to single-digit
  // MB/s (r17 optimization round), and everything java.io.tmpdir holds
  // here is run-scoped scratch. SPARK_GRAFT_TMPDIR overrides; empty
  // value keeps the system default. Temp checkpoints are force-deleted on
  // query stop, so tmpfs holds only live run state.
  sys.env.get("SPARK_GRAFT_TMPDIR").map(_.trim).filter(_.nonEmpty)
    .orElse {
      val shm = new java.io.File("/dev/shm")
      if (sys.env.get("SPARK_GRAFT_TMPDIR").isEmpty &&
          shm.isDirectory && shm.canWrite &&
          shm.getUsableSpace >= (32L << 30)) {
        val d = new java.io.File(shm, "graft-tmp")
        d.mkdirs()
        if (d.isDirectory && d.canWrite) Some(d.getAbsolutePath) else None
      } else None
    }
    .map(d => s"-Djava.io.tmpdir=$d").toSeq ++
  // Dev-only passthrough for extra forked-JVM flags (GC logging, JFR, …):
  // SPARK_GRAFT_JVM_OPTS="-Xlog:gc*:stderr:time" sbt "runMain graft.Bench"
  // (trim + drop empties: a leading space would otherwise pass "" as a
  // literal argument, which java reads as the main class → an opaque
  // "Could not find or load main class" failure)
  sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq
    .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
