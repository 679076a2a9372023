package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Dev measurement tool (guide §1): run one SparkEntry query under a
  * SparkListener and print every Spark JOB it launches — wall ms, stage
  * task-time, shuffle bytes, description — plus the driver-side gap
  * (wall time not covered by any job = planning/listing/commit/sleep).
  *
  * Usage: runMain graft.JobProf <sfDir> <query> [query ...]
  */
object JobProf {
  final case class JobRow(id: Int, start: Long, var end: Long = 0L,
                          var desc: String = "")

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobProf <sfDir> <query> [query ...]")
    val d = args(0)
    val s = GraftSession("graft-jobprof")
    // warmup (same as Bench: JVM/codegen startup is session cost)
    try SparkEntry.queries("q1_agg")(s, d).write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }
    s.sharedState.cacheManager.clearCache()

    args.drop(1).foreach { name =>
      val jobs = new ConcurrentLinkedQueue[JobRow]()
      val stages = new ConcurrentLinkedQueue[(Int, Int, Long, Long, Long, String)]()
      val taskMs = new java.util.concurrent.atomic.AtomicLong(0)
      val shufR = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new SparkListener {
        override def onJobStart(e: SparkListenerJobStart): Unit = {
          val r = JobRow(e.jobId, e.time)
          val props = Option(e.properties)
          val execDesc = props
            .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
            .flatMap { id =>
              org.apache.spark.sql.GraftBridge.queryExecutionFor(id.toLong)
                .map { qe =>
                  val head = qe.analyzed.toString.linesIterator
                    .take(2).mkString(" | ").take(150)
                  s"exec=$id $head"
                }
            }
          r.desc = props
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(execDesc)
            .orElse(props.flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("")
          jobs.add(r)
        }
        override def onJobEnd(e: SparkListenerJobEnd): Unit =
          jobs.asScala.find(_.id == e.jobId).foreach(_.end = e.time)
        override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
          taskMs.addAndGet(e.stageInfo.taskMetrics.executorRunTime)
          shufR.addAndGet(e.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
          stages.add((e.stageInfo.stageId, e.stageInfo.numTasks,
            e.stageInfo.taskMetrics.executorRunTime,
            e.stageInfo.taskMetrics.executorCpuTime / 1000000L,
            e.stageInfo.taskMetrics.jvmGCTime,
            e.stageInfo.name.take(90)))
        }
      }
      // two passes: pass 1 warms (page cache, codegen); pass 2 is measured
      (1 to 2).foreach { pass =>
        jobs.clear(); stages.clear(); taskMs.set(0); shufR.set(0)
        s.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(s, d).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable => println(s"[jobprof] $name FAILED: $e") }
        val wallMs = (System.nanoTime() - t0) / 1e6
        org.apache.spark.sql.GraftBridge.drainListenerBus(s.sparkContext)
        s.sparkContext.removeSparkListener(listener)
        s.sharedState.cacheManager.clearCache()
        if (pass == 2) {
          val rows = jobs.asScala.toSeq.sortBy(_.start)
          val covered = rows.filter(_.end > 0).map(r => r.end - r.start).sum
          println(f"== $name wall=${wallMs / 1000}%.2fs jobs=${rows.size} " +
            f"jobtime=${covered / 1000.0}%.2fs gap=${(wallMs - covered) / 1000}%.2fs " +
            f"taskMs=${taskMs.get}%d shufRead=${shufR.get / 1024}%dKiB")
          rows.foreach { r =>
            val dur = if (r.end > 0) r.end - r.start else -1
            println(f"  job ${r.id}%4d ${dur}%6d ms  ${r.desc.take(160)}")
          }
          stages.asScala.toSeq.sortBy(-_._3).take(12).foreach {
            case (sid, nt, run, cpu, gc, nm) =>
              println(f"  stage $sid%4d tasks=$nt%3d run=${run}%7d cpu=${cpu}%7d gc=${gc}%6d  $nm")
          }
        }
      }
    }
    s.stop()
  }
}
