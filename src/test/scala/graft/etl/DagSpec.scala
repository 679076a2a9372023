package graft.etl

import java.util.concurrent.atomic.AtomicInteger

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** A28 runtime invariants the trace relation can't see: capacity
  * ceilings, dependency barriers, resume-from-checkpoint, jitter
  * immunity. The relation itself (executed trace == distributed plan ==
  * DuckDB oracle) is the driver's hash gate via `dag_run`/`dag_plan`.
  */
class DagSpec extends AnyFunSuite {
  import Dag._

  private val script = (st: String, j: String, attempt: Int) =>
    if (attempt <= failCount(st, j)) throw new RuntimeException(s"injected $st/$j/$attempt")

  private def fanJobs(n: Int): String => Seq[String] = {
    val dbs = (0 until n).map(i => f"db_$i%03d_core_110_1")
    st => if (fanStages.contains(st)) dbs else Seq(controlJob)
  }

  test("executed trace equals the distributed plan relation (sf0.001)") {
    val s = TestSpark.spark
    val ran = dagRun(s, TestSpark.sf).collect().map(_.toSeq).toSet
    val plan = dagPlan(s, TestSpark.sf).collect().map(_.toSeq).toSet
    assert(ran == plan)
    assert(ran.nonEmpty)
  }

  test("expected outcome mix at this fan: tolerated failures, a failed stage, skip propagation") {
    val s = TestSpark.spark
    val rows = dagPlan(s, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3), r.getString(4), r.getString(5)))
    val stageStatus = rows.map(r => (r._1, r._5)).toMap
    // grant exceeds its 10% tolerance on this db list; everything else
    // tolerates its failures; notify (downstream of grant) is skipped.
    assert(stageStatus("download") == "DONE")
    assert(stageStatus("checksum") == "DONE")
    assert(stageStatus("load") == "DONE")
    assert(stageStatus("healthcheck") == "DONE")
    assert(stageStatus("grant") == "FAILED")
    assert(stageStatus("notify") == "SKIPPED")
    // tolerated per-job failures exist inside DONE stages
    assert(rows.exists(r => r._1 == "load" && r._4 == "FAILED" && r._5 == "DONE"))
    // retries happened: some job needed >1 attempt and still succeeded
    assert(rows.exists(r => r._3 > 1 && r._4 == "DONE"))
    // skipped jobs never ran
    assert(rows.filter(_._1 == "notify").forall(r => r._3 == 0 && r._4 == "SKIPPED"))
  }

  test("per-stage capacity is a hard ceiling under thread jitter") {
    val gauges = collection.concurrent.TrieMap[String, AtomicInteger]()
    val peaks = collection.concurrent.TrieMap[String, AtomicInteger]()
    val res = Dag.run(pipeline, fanJobs(40), (st, j, attempt) => {
      val g = gauges.getOrElseUpdate(st, new AtomicInteger)
      val now = g.incrementAndGet()
      peaks.getOrElseUpdate(st, new AtomicInteger).getAndAccumulate(now, Math.max(_, _))
      try {
        Thread.sleep((j.hashCode.abs % 7).toLong) // jitter
        script(st, j, attempt)
      } finally g.decrementAndGet()
    })
    val caps = pipeline.map(s => s.name -> s.capacity).toMap
    peaks.foreach { case (st, p) => assert(p.get() <= caps(st), s"stage $st over capacity") }
    res.stages.values.foreach(r => assert(r.maxConcurrent <= caps(r.name)))
  }

  test("dependency barrier: a stage starts after every dependency ends; branches overlap") {
    val res = Dag.run(pipeline, fanJobs(24),
      (st, j, attempt) => { Thread.sleep(1); script(st, j, attempt) })
    val runs = res.stages
    pipeline.foreach { st =>
      st.deps.filter(d => runs(d).status == "DONE").foreach { d =>
        if (runs(st.name).status != "SKIPPED")
          assert(runs(st.name).startNs >= runs(d).endNs,
            s"${st.name} started before dep $d finished")
      }
    }
    // healthcheck and grant both follow load and ran concurrently (their
    // intervals overlap) — independent branches are not serialized
    val h = runs("healthcheck"); val g = runs("grant")
    assert(h.startNs < g.endNs && g.startNs < h.endNs)
  }

  test("trace relation is immune to scheduling jitter") {
    def relation(jitter: Boolean) =
      Dag.run(pipeline, fanJobs(24), (st, j, attempt) => {
        if (jitter) Thread.sleep(Math.floorMod(st.hashCode + j.hashCode, 5).toLong)
        script(st, j, attempt)
      }).jobs.map(r => (r.stage, r.job, r.attempts, r.outcome)).toSet
    assert(relation(jitter = true) == relation(jitter = false))
  }

  test("resume from a checkpoint: completed jobs never re-invoke the body") {
    val jobs = fanJobs(24)
    val full = Dag.run(pipeline, jobs, script)
    val doneDownloads = full.jobs
      .filter(r => r.stage == "download" && r.outcome == "DONE")
      .map(r => ("download", r.job)).toSet
    val resumed = Dag.run(pipeline, jobs, script, completed = doneDownloads)
    // body invocations drop by exactly the attempts the checkpoint covers
    val saved = full.jobs
      .filter(r => r.stage == "download" && doneDownloads((r.stage, r.job)))
      .map(_.attempts.toLong).sum
    assert(resumed.bodyInvocations == full.bodyInvocations - saved)
    // checkpointed jobs are recorded DONE with 0 attempts; outcomes of
    // everything else are unchanged
    resumed.jobs.filter(r => doneDownloads((r.stage, r.job)))
      .foreach(r => assert(r.attempts == 0 && r.outcome == "DONE"))
    def rest(rs: Seq[JobResult]) = rs.filterNot(r => doneDownloads((r.stage, r.job)))
      .map(r => (r.stage, r.job, r.attempts, r.outcome)).toSet
    assert(rest(resumed.jobs) == rest(full.jobs))
  }

  test("a failed root skips the whole downstream cascade") {
    val res = Dag.run(pipeline, fanJobs(8),
      (st, j, attempt) => if (st == "download") throw new RuntimeException("dead") else script(st, j, attempt))
    assert(res.stages("download").status == "FAILED")
    Seq("checksum", "load", "healthcheck", "grant", "notify").foreach { st =>
      assert(res.stages(st).status == "SKIPPED", st)
      assert(res.jobs.filter(_.stage == st).forall(r => r.outcome == "SKIPPED" && r.attempts == 0))
    }
    // retries were exhausted before giving up
    assert(res.jobs.filter(_.stage == "download").forall(_.attempts == 3))
  }

  test("jobs run real Spark actions under the stage's FAIR pool (A29 × A14)") {
    val s = TestSpark.spark
    val flowOf = Map("discover" -> 2, "prioritise" -> 3, "download" -> 5)
    val seenPools = collection.concurrent.TrieMap[String, String]()
    val counted = new AtomicInteger(0)
    val res = Dag.run(pipeline.take(3), fanJobs(6), (st, j, attempt) =>
      Lanes.runInLane(s, flowOf(st)) {
        seenPools.put(st, s.sparkContext.getLocalProperty("spark.scheduler.pool"))
        counted.addAndGet(s.range(10).count().toInt) // a real distributed job
        script(st, j, attempt)
      })
    assert(res.stages.values.count(_.status == "DONE") == 3)
    assert(seenPools("discover") == "basic")
    assert(seenPools("prioritise") == "high")
    assert(seenPools("download") == "human_variation")
    assert(counted.get() >= 10 * (2 + 6)) // every first attempt ran a job
  }

  test("a PermanentFailure dies on its attempt without burning the retry budget") {
    val attemptsSeen = new AtomicInteger(0)
    val res = Dag.run(pipeline.take(3), fanJobs(4), (st, j, attempt) => {
      if (st == "download") {
        attemptsSeen.incrementAndGet()
        if (j.endsWith("000_core_110_1")) throw new Dag.PermanentFailure("bad input")
        else throw new RuntimeException("transient") // retries until budget gone
      }
    })
    val dl = res.jobs.filter(_.stage == "download")
    // the permanent job recorded exactly 1 attempt; transient ones 3
    assert(dl.find(_.job.endsWith("000_core_110_1")).get.attempts == 1)
    assert(dl.filterNot(_.job.endsWith("000_core_110_1")).forall(_.attempts == 3))
    assert(dl.forall(_.outcome == "FAILED"))
    assert(attemptsSeen.get() == 1 + 3 * 3) // 1 permanent + 3 jobs × 3 attempts
  }

  test("fatal throwable from a job body: job recorded FAILED, queue never silently dropped") {
    // capacity-1 stage, 4 jobs, body hurls an Error (not Exception) on
    // job b — the sole worker dies; the gate must still account ALL jobs
    val stages = Seq(StageDef("only", Nil, 1, 2, 0))
    val jobs = Seq("a", "b", "c", "d")
    val res = Dag.run(stages, _ => jobs, (_, j, _) =>
      if (j == "b") throw new InternalError("fatal body") else ())
    assert(res.stages("only").status == "FAILED")
    val byJob = res.jobs.map(r => r.job -> r.outcome).toMap
    assert(byJob.keySet == jobs.toSet, s"jobs dropped from the trace: $byJob")
    assert(byJob("a") == "DONE")
    assert(byJob("b") == "FAILED") // the fatal job itself, recorded before death
    // c and d were queued behind the dead worker: accounted FAILED, not lost
    assert(byJob("c") == "FAILED" && byJob("d") == "FAILED")
    // fatal must not burn the retry budget like a transient: exactly 1 attempt
    assert(res.jobs.find(_.job == "b").get.attempts == 1)
  }

  test("jobsOf throwing for a stage: run fails loudly instead of hanging") {
    val stages = Seq(
      StageDef("ok",   Nil,        1, 0, 0),
      StageDef("boom", Seq("ok"),  1, 0, 0),
      StageDef("down", Seq("boom"), 1, 0, 0))
    val res = Dag.run(stages,
      st => if (st == "boom") throw new IllegalStateException("no jobs for " + st) else Seq("j"),
      (_, _, _) => ())
    assert(res.stages("ok").status == "DONE")
    assert(res.stages("boom").status == "FAILED")
    assert(res.stages("down").status == "SKIPPED")
  }

  test("static topology: waves and ancestor closure") {
    val wv = waves(pipeline)
    assert(wv("discover") == 1 && wv("prioritise") == 2 && wv("download") == 3)
    assert(wv("checksum") == 4 && wv("load") == 5)
    assert(wv("healthcheck") == 6 && wv("grant") == 6 && wv("notify") == 7)
    val anc = ancestors(pipeline)
    assert(anc("notify") == Set("discover", "prioritise", "download", "checksum",
      "load", "healthcheck", "grant"))
    assert(anc("discover").isEmpty)
  }
}
