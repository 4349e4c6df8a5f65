ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "data_engineering_projectsspark"
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
// The round driver captures the tail of `sbt "runMain graft.Bench"` and
// json-parses the FINAL line. sbt's default LoggedOutput wraps the
// forked app's stdout in "[info] " (breaking the parse) and tags its
// stderr "[error]" into the same log, and the "[success] Total time"
// footer prints after the app's last line. Pass the forked streams
// through untouched and drop the footer so the bench's slim JSON is the
// true final stdout line.
outputStrategy := Some(OutputStrategy.StdoutOutput)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command engine, not by settings/tasks;
// console / classLoaderLayeringStrategy only by the interactive console
Global / excludeLintKeys ++= Set(showSuccess, classLoaderLayeringStrategy)
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
// Forked-JVM temp (temp streaming checkpoints, spark.local.dir shuffle
// spill, drain staging dirs) on tmpfs when the host has one: streaming
// state-store commits are small-file-I/O bound and /dev/shm measures
// ~10× /tmp here. Pinned in the build — not session env — because the
// r4→r5 bench drift on every st_* entry was exactly this setting living
// only in a shell that died with the session.
val graftTmpfs: Option[String] = {
  val d = new java.io.File("/dev/shm/graft_tmp")
  if (d.isDirectory || d.mkdirs()) Some(d.getAbsolutePath) else None
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++ graftTmpfs.map(p => s"-Djava.io.tmpdir=$p").toSeq

// Flat classloader for `sbt console`: the default layered strategy makes
// Spark's runtime reflection throw "Prohibited package name: java.sql"
// when product code builds Encoders from the REPL (profiling sessions).
Compile / console / classLoaderLayeringStrategy := ClassLoaderLayeringStrategy.Flat
