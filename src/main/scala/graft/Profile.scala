package graft

/** Dev tool: time named `SparkEntry.queries` entries against an sf dir
  * (two passes each — cold plan + warm) without the full Bench sweep.
  *
  * Usage: runMain graft.Profile <sfDir> <query> [query ...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Profile <sfDir> <query> [query ...]")
    val d = args(0)
    val s = GraftSession("graft-profile")
    try SparkEntry.queries("q1_agg")(s, d).write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }
    args.drop(1).foreach { n =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(s, d).write.mode("overwrite").format("noop").save()
        println(f"[prof] $n pass$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
        s.sharedState.cacheManager.clearCache()
      }
    }
    s.stop()
  }
}
