ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ensembldatabaseloaderspark"
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
// Pass the forked process stdout straight through (no [info] prefix) so the
// driver can parse Bench's single JSON line.
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
// Heap scales with the benched core count: local[N] runs driver AND all
// executor task slots in ONE JVM, so a flat 8g gives 32 concurrent tasks
// ~150 MB of execution memory each and the stateful/aggregating queries
// GC-thrash (measured: stream_token_sketch 39.8s at 8g vs 8.0s at 16g in
// the same 5-query sequence). 0.5 GB/slot, floor 8g, cap 16g — the same
// per-slot memory a production executor sizing would give, parameterized
// by SPARK_GRAFT_CPUS so lower-core driver runs keep their old envelope,
// and SPARK_DRIVER_MEM still overrides explicitly.
val graftHeap = sys.env.get("SPARK_DRIVER_MEM").getOrElse {
  val cpus = sys.env.get("SPARK_GRAFT_CPUS")
    .flatMap(c => scala.util.Try(c.trim.toInt).toOption).getOrElse(4)
  s"${math.min(16, math.max(8, cpus / 2))}g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$graftHeap",
)
