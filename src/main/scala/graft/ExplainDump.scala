package graft

import java.nio.file.{Files, Paths}

/** Dev measurement tool (guide §7.2): dump `explain("formatted")` for
  * named queries to files — the before/after plan evidence an
  * optimization round commits under `plans/rN/`.
  *
  * Usage: runMain graft.ExplainDump <sfDir> <outDir> <tag> <query> [query ...]
  * writes <outDir>/<query>_<tag>.txt for each query.
  *
  * Queries that eagerly localCheckpoint (or execute DML while building)
  * are documented through PlanOnly's un-staged builders when one exists,
  * so the dump shows the real operator tree, not a Scan ExistingRDD.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: ExplainDump <sfDir> <outDir> <tag> <query>...")
    val Array(d, outDir, tag) = args.take(3)
    val s = GraftSession("graft-explain")
    Files.createDirectories(Paths.get(outDir))
    args.drop(3).foreach { name =>
      val fn = PlanOnly.builders.getOrElse(name, SparkEntry.queries(name))
      try {
        val df = fn(s, d)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
        println(s"[explain] wrote $name")
      } catch {
        case e: Throwable => System.err.println(s"[explain] $name FAILED: $e")
      }
      s.sharedState.cacheManager.clearCache()
    }
    s.stop()
  }
}
