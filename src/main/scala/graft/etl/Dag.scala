package graft.etl

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, Executors}
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.JavaConverters._
import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A28: the executing DAG orchestrator — the reference's eHive pipeline
  * wiring (LoadDBs_conf.pm:108-210) run end-to-end, not just modelled.
  *
  * A14/A20/A21 already express the reference's capacity lanes, semaphores
  * and drain waves as oracle-checked relations; what they deliberately left
  * out is a runtime that actually drives a multi-stage retrying DAG. This
  * is it: `Runner` executes stages under real dependency barriers
  * (a stage starts only after every dependency's last job is terminal —
  * eHive's `'2->A' => [...], 'A->1' => [...]` semaphore contract),
  * per-stage concurrency caps (`analysis_capacity`, here capacity-many queue-pulling workers;
  * on a cluster the same stage routing feeds Lanes' FAIR pools), per-job
  * retry loops (`max_retry_count`), a failed-job tolerance gate
  * (`failed_job_tolerance`, LoadDBs_conf.pm:133) deciding whether the
  * stage releases its semaphore as DONE, and skip propagation (downstream
  * of a failed stage never runs).
  *
  * Determinism contract: job outcomes depend only on the injected job
  * body — never on thread timing. Scheduling jitter can reorder event
  * timestamps but cannot change the trace RELATION, which is why the
  * executed trace itself sits under the DuckDB oracle (`dag_run`) next to
  * its distributed relational twin (`dag_plan`): the hash gate proves the
  * runtime implements exactly the declared semantics. DagSpec drives the
  * runtime invariants the relation can't see (capacity ceilings, barrier
  * ordering, resume-from-checkpoint, jitter immunity).
  *
  * Orchestration is driver-side by nature (eHive's beekeeper loop); each
  * JOB is the distributed part — its body submits Spark jobs (optionally
  * under the stage's FAIR pool via [[Lanes.runInLane]]). The fan list
  * collected to the driver is db NAMES (one short string per database,
  * like the reference's job table), never data-scale rows.
  */
object Dag {

  /** One analysis in the pipeline graph.
    *
    * @param tolerancePct stage still releases DONE if
    *   `100 * failed_jobs <= tolerancePct * jobs` (eHive's
    *   failed_job_tolerance).
    */
  final case class StageDef(name: String, deps: Seq[String], capacity: Int,
                            maxRetries: Int, tolerancePct: Int)

  /** The mirror pipeline's analyses (LoadDBs_conf.pm:108-210): control
    * stages fan out per-db work; checksum gates load; healthcheck and
    * grant both follow load; notify funnels everything.
    */
  val pipeline: Seq[StageDef] = Seq(
    StageDef("discover",    Nil,                           1, 0, 0),
    StageDef("prioritise",  Seq("discover"),               1, 0, 0),
    StageDef("download",    Seq("prioritise"),             5, 2, 10),
    StageDef("checksum",    Seq("download"),               4, 1, 10),
    StageDef("load",        Seq("checksum", "prioritise"), 4, 2, 10),
    StageDef("healthcheck", Seq("load"),                   4, 0, 25),
    StageDef("grant",       Seq("load"),                   2, 1, 10),
    StageDef("notify",      Seq("healthcheck", "grant"),   1, 0, 0))

  val fanStages: Seq[String] = Seq("download", "checksum", "load", "healthcheck", "grant")

  /** Control stages run one pipeline-wide job. */
  val controlJob = "(pipeline)"

  /** Static topological depth: wave(s) = 1 + max(wave(deps)). */
  def waves(stages: Seq[StageDef]): Map[String, Int] = {
    val byName = stages.map(s => s.name -> s).toMap
    val memo = mutable.Map[String, Int]()
    def w(n: String): Int = memo.getOrElseUpdate(n,
      if (byName(n).deps.isEmpty) 1 else 1 + byName(n).deps.map(w).max)
    stages.foreach(s => w(s.name))
    memo.toMap
  }

  /** Static transitive dependency closure (excluding the stage itself). */
  def ancestors(stages: Seq[StageDef]): Map[String, Set[String]] = {
    val byName = stages.map(s => s.name -> s).toMap
    val memo = mutable.Map[String, Set[String]]()
    def a(n: String): Set[String] = memo.getOrElseUpdate(n,
      byName(n).deps.toSet ++ byName(n).deps.flatMap(a))
    stages.foreach(s => a(s.name))
    memo.toMap
  }

  // ---------------------------------------------------------------------
  // Deterministic failure script (shared by dag_plan, dag_run and the
  // DuckDB oracle): job j of stage s fails its first failCount(s, j)
  // attempts, then succeeds. Seeded from the job name only — portable
  // arithmetic both engines evaluate identically.
  // ---------------------------------------------------------------------

  def failSeed(job: String): Int = (job.length * 31 + job.head.toInt * 7) % 23

  def failCount(stage: String, job: String): Int = {
    val f = failSeed(job)
    stage match {
      case "download"    => if (f % 11 == 0) 3 else f % 2
      case "checksum"    => if (f % 13 == 0) 2 else 0
      case "load"        => if (f % 17 == 0) 3 else f % 3
      case "healthcheck" => if (f % 3 == 0) 1 else 0
      case "grant"       => if (f % 19 == 0) 2 else f % 2
      case _             => 0 // control stages always succeed
    }
  }

  /** The same script as a Column over (stage, job) — the distributed twin. */
  private def failCountCol(stage: org.apache.spark.sql.Column,
                           job: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val f = (length(job) * 31 + ascii(job) * 7) % 23
    when(stage === "download", when(f % 11 === 0, 3).otherwise(f % 2))
      .when(stage === "checksum", when(f % 13 === 0, 2).otherwise(0))
      .when(stage === "load", when(f % 17 === 0, 3).otherwise(f % 3))
      .when(stage === "healthcheck", when(f % 3 === 0, 1).otherwise(0))
      .when(stage === "grant", when(f % 19 === 0, 2).otherwise(f % 2))
      .otherwise(0)
  }

  // ---------------------------------------------------------------------
  // dag_plan: the expected trace, computed distributively.
  // ---------------------------------------------------------------------

  /** A28 (plan half): per-job (wave, attempts, outcome, stage_status) of
    * running [[pipeline]] over the discovered databases under the
    * deterministic failure script. One hash aggregation over the fan
    * decides each stage's tolerance gate; everything else is broadcast
    * joins against the 8-row stage dimension — the fan relation is
    * touched exactly twice (jobs + gate) regardless of its size.
    */
  def dagPlan(s: SparkSession, d: String): DataFrame = {
    val sq = s; import sq.implicits._
    val wv = waves(pipeline)
    val anc = ancestors(pipeline)

    val stageDim = pipeline.map(st =>
      (st.name, st.maxRetries.toLong, st.tolerancePct.toLong, wv(st.name).toLong,
        fanStages.contains(st.name)))
      .toDF("stage", "max_retries", "tolerance_pct", "wave", "fan")

    val fanJobs = Discovery.databases(s, d).select(col("db").as("job"))
      .crossJoin(broadcast(stageDim.filter(col("fan"))))
    val controlJobs = stageDim.filter(!col("fan"))
      .select(lit(controlJob).as("job"), col("stage"), col("max_retries"),
        col("tolerance_pct"), col("wave"), col("fan"))
    val jobs = fanJobs.select(controlJobs.columns.map(col).toIndexedSeq: _*)
      .unionByName(controlJobs)
      .withColumn("fc", failCountCol(col("stage"), col("job")).cast("long"))
      .withColumn("attempts_if_run", least(col("fc") + 1, col("max_retries") + 1))
      .withColumn("ok_if_run", col("fc") <= col("max_retries"))

    // Tolerance gate per stage: would the stage release DONE if it ran?
    val gate = jobs.groupBy("stage")
      .agg((sum(when(col("ok_if_run"), 0L).otherwise(1L)) * 100 <=
        first(col("tolerance_pct")) * count(lit(1))).as("local_ok"))

    // Skip propagation over the static closure: a stage is skipped iff any
    // transitive ancestor fails its own gate (argument in scaladoc of
    // `ancestors`: intermediate stages that would themselves be skipped
    // cannot flip the answer, because the blocking ancestor is also in the
    // closure). 8×8 worst case — broadcast territory.
    val ancRows = anc.toSeq.flatMap { case (st, as) => as.toSeq.map(a => (st, a)) }
    val skipped =
      if (ancRows.isEmpty) gate.select(col("stage"), lit(false).as("skip"))
      else ancRows.toDF("stage", "anc")
        .join(gate.select(col("stage").as("anc"), col("local_ok")), Seq("anc"))
        .groupBy("stage").agg(max(when(col("local_ok"), 0).otherwise(1)) === 1).as("t")
        .toDF("stage", "skip")

    val stageStatus = gate.join(skipped, Seq("stage"), "left_outer")
      .select(col("stage"),
        when(coalesce(col("skip"), lit(false)), "SKIPPED")
          .when(col("local_ok"), "DONE").otherwise("FAILED").as("stage_status"))

    jobs.join(broadcast(stageStatus), Seq("stage"))
      .select(col("stage"), col("job"), col("wave"),
        when(col("stage_status") === "SKIPPED", 0L)
          .otherwise(col("attempts_if_run")).as("attempts"),
        when(col("stage_status") === "SKIPPED", "SKIPPED")
          .when(col("ok_if_run"), "DONE").otherwise("FAILED").as("outcome"),
        col("stage_status"))
      .orderBy("stage", "job")
  }

  // ---------------------------------------------------------------------
  // The runtime: a beekeeper loop with real threads, capacity workers, retries.
  // ---------------------------------------------------------------------

  /** Throw from a job body to mark the failure PERMANENT: the job dies on
    * this attempt without consuming its remaining retries (eHive's
    * "job died" vs "job failed, will retry" classification).
    */
  final class PermanentFailure(msg: String) extends RuntimeException(msg)

  final case class JobResult(stage: String, job: String, attempts: Int, outcome: String)
  final case class StageRun(name: String, status: String, startNs: Long, endNs: Long,
                            maxConcurrent: Int)
  final case class DagResult(jobs: Seq[JobResult], stages: Map[String, StageRun],
                             bodyInvocations: Long)

  /** Execute `stages` over `jobsOf(stage)`, calling `body(stage, job,
    * attempt)` for every attempt (throw = attempt failed). Jobs in
    * `completed` (a resume checkpoint, the reference's `-reg_conf`-style
    * rerun) are recorded DONE with 0 attempts and never invoke the body.
    *
    * Per stage: `capacity` worker threads PULL jobs from the stage queue
    * (eHive's worker model — thread count is O(capacity), never O(fan)),
    * and a latch joins the workers before the tolerance gate decides the
    * release (eHive: the funnel's semaphore count reaching zero). The
    * scheduler launches every stage whose deps are all terminal, so
    * independent branches (healthcheck ∥ grant) genuinely overlap.
    */
  def run(stages: Seq[StageDef], jobsOf: String => Seq[String],
          body: (String, String, Int) => Unit,
          completed: Set[(String, String)] = Set.empty): DagResult = {
    val byName = stages.map(s => s.name -> s).toMap
    val status = mutable.Map[String, String]()               // guarded by `lock`
    val runs = mutable.Map[String, StageRun]()
    val results = new ConcurrentLinkedQueue[JobResult]()
    val invocations = new AtomicInteger(0)
    val lock = new Object
    val pool = Executors.newCachedThreadPool()
    try {
      def terminal(n: String) = {
        val s = status.get(n)
        s.contains("DONE") || s.contains("FAILED") || s.contains("SKIPPED")
      }

      def runStage(st: StageDef): Unit = {
        val jobs = jobsOf(st.name)
        // eHive's worker model: `capacity` workers PULL from the stage's
        // job queue — thread count is O(capacity), never O(fan size), so a
        // 100k-job fan costs the same handful of threads as a 10-job one.
        val queue = new ConcurrentLinkedQueue[String]()
        jobs.foreach(queue.add)
        val nWorkers = math.max(1, math.min(st.capacity, jobs.size))
        val latch = new CountDownLatch(nWorkers)
        val running = new AtomicInteger(0)
        val peak = new AtomicInteger(0)
        val failed = new AtomicInteger(0)
        val start = System.nanoTime()
        (0 until nWorkers).foreach { _ =>
          pool.submit(new Runnable {
            override def run(): Unit = {
              try {
                var j = queue.poll()
                while (j != null) {
                  val now = running.incrementAndGet()
                  peak.getAndAccumulate(now, Math.max(_, _))
                  try {
                    if (completed((st.name, j))) {
                      results.add(JobResult(st.name, j, 0, "DONE"))
                    } else {
                      var attempt = 0
                      var ok = false
                      var permanent = false
                      try {
                        while (!ok && !permanent && attempt <= st.maxRetries) {
                          attempt += 1
                          invocations.incrementAndGet()
                          try { body(st.name, j, attempt); ok = true }
                          catch {
                            // eHive's job-death classification: a permanent
                            // failure (bad input, missing table) must not
                            // burn the retry budget a transient one
                            // (connection drop, lock timeout) earns
                            case _: PermanentFailure => permanent = true
                            case scala.util.control.NonFatal(_) => ()
                          }
                        }
                      } catch {
                        // A fatal throwable (OOM, LinkageError) kills this
                        // worker — record the job FAILED first so the
                        // tolerance gate and the trace stay complete, then
                        // rethrow loudly. Jobs still queued are accounted
                        // after latch.await() below.
                        case t: Throwable =>
                          failed.incrementAndGet()
                          results.add(JobResult(st.name, j, attempt, "FAILED"))
                          throw t
                      }
                      if (!ok) failed.incrementAndGet()
                      results.add(JobResult(st.name, j, attempt, if (ok) "DONE" else "FAILED"))
                    }
                  } finally running.decrementAndGet()
                  j = queue.poll()
                }
              } finally latch.countDown()
            }
          })
        }
        latch.await()
        // If every worker that could drain the queue died on a fatal
        // throwable, jobs remain queued and unrun: record them FAILED so
        // a capacity-1 stage can never release DONE over silently-dropped
        // work.
        var orphan = queue.poll()
        while (orphan != null) {
          failed.incrementAndGet()
          results.add(JobResult(st.name, orphan, 0, "FAILED"))
          orphan = queue.poll()
        }
        val ok = failed.get().toLong * 100 <= st.tolerancePct.toLong * jobs.size
        lock.synchronized {
          status(st.name) = if (ok) "DONE" else "FAILED"
          runs(st.name) = StageRun(st.name, status(st.name), start, System.nanoTime(), peak.get())
          lock.notifyAll()
        }
      }

      lock.synchronized {
        val launched = mutable.Set[String]()
        while (status.size < stages.size) {
          // Scan to fixpoint: an inline SKIPPED makes new stages terminal,
          // which can cascade regardless of the Seq's ordering.
          var progress = true
          while (progress) {
            progress = false
            stages.filterNot(s => launched(s.name)).foreach { st =>
              if (st.deps.forall(terminal)) {
                launched += st.name
                progress = true
                if (st.deps.forall(d => status(d) == "DONE")) {
                  pool.submit(new Runnable {
                    override def run(): Unit =
                      try runStage(st)
                      catch {
                        // runStage failing before its own status write
                        // (e.g. jobsOf throwing for the stage name) must
                        // still terminate the stage, or the scheduler's
                        // wait loop re-waits forever: record FAILED and
                        // wake the scheduler so the error surfaces as a
                        // failed run instead of a hang.
                        case t: Throwable =>
                          lock.synchronized {
                            if (!status.contains(st.name)) {
                              val now = System.nanoTime()
                              status(st.name) = "FAILED"
                              runs(st.name) = StageRun(st.name, "FAILED", now, now, 0)
                            }
                            lock.notifyAll()
                          }
                          throw t
                      }
                  })
                } else {
                  val now = System.nanoTime()
                  jobsOf(st.name).foreach(j => results.add(JobResult(st.name, j, 0, "SKIPPED")))
                  status(st.name) = "SKIPPED"
                  runs(st.name) = StageRun(st.name, "SKIPPED", now, now, 0)
                }
              }
            }
          }
          if (status.size < stages.size) lock.wait(10000)
        }
      }
      DagResult(results.asScala.toSeq, runs.toMap, invocations.get().toLong)
    } finally pool.shutdown()
  }

  /** A28 (run half): [[run]] driven by the deterministic failure script
    * over the discovered databases, its executed trace returned as the
    * SAME relation as [[dagPlan]] — and checked against the same DuckDB
    * oracle, so the hash gate proves the runtime honors the declared
    * retry/tolerance/skip semantics. The fan list collected here is db
    * names (the orchestrator's job table), not data.
    */
  def dagRun(s: SparkSession, d: String): DataFrame = {
    val sq = s; import sq.implicits._
    val dbs = Discovery.databases(s, d).orderBy("db").collect().map(_.getString(0)).toSeq
    val jobsOf = (st: String) => if (fanStages.contains(st)) dbs else Seq(controlJob)
    val res = run(pipeline, jobsOf, (st, j, attempt) =>
      if (attempt <= failCount(st, j)) throw new RuntimeException(s"injected $st/$j/$attempt"))
    val wv = waves(pipeline)
    val stageStatus = res.stages.map { case (n, r) => n -> r.status }
    res.jobs.toSeq
      .map(r => (r.stage, r.job, wv(r.stage).toLong, r.attempts.toLong, r.outcome,
        stageStatus(r.stage)))
      .toDF("stage", "job", "wave", "attempts", "outcome", "stage_status")
      .repartition(1)
      .orderBy("stage", "job")
  }

  /** DuckDB oracle shared by dag_plan and dag_run: the static topology
    * (waves, transitive closure) inlined as literals; fan, failure script,
    * tolerance gates and skip propagation replayed in SQL.
    */
  def oracleSql(dbsCte: String): String = {
    val wv = waves(pipeline)
    val anc = ancestors(pipeline)
    val stageVals = pipeline.map(st =>
      s"('${st.name}', ${st.maxRetries}, ${st.tolerancePct}, ${wv(st.name)}, " +
        s"${if (fanStages.contains(st.name)) "TRUE" else "FALSE"})").mkString(",\n        ")
    val ancVals = anc.toSeq.flatMap { case (s0, as) => as.toSeq.map(a => s"('$s0','$a')") }
      .mkString(",\n        ")
    s"""$dbsCte,
      stages(stage, max_retries, tolerance_pct, wave, fan) AS (VALUES
        $stageVals),
      anc(stage, anc_stage) AS (VALUES
        $ancVals),
      jobs AS (
        SELECT s.stage, j.job, s.max_retries, s.tolerance_pct, s.wave
        FROM stages s JOIN (SELECT db AS job FROM dbs) j ON s.fan
        UNION ALL
        SELECT stage, '(pipeline)', max_retries, tolerance_pct, wave
        FROM stages WHERE NOT fan),
      scripted AS (
        SELECT *,
          (length(job) * 31 + ascii(job) * 7) % 23 AS f,
          CASE stage
            WHEN 'download'    THEN CASE WHEN ((length(job)*31 + ascii(job)*7) % 23) % 11 = 0 THEN 3 ELSE ((length(job)*31 + ascii(job)*7) % 23) % 2 END
            WHEN 'checksum'    THEN CASE WHEN ((length(job)*31 + ascii(job)*7) % 23) % 13 = 0 THEN 2 ELSE 0 END
            WHEN 'load'        THEN CASE WHEN ((length(job)*31 + ascii(job)*7) % 23) % 17 = 0 THEN 3 ELSE ((length(job)*31 + ascii(job)*7) % 23) % 3 END
            WHEN 'healthcheck' THEN CASE WHEN ((length(job)*31 + ascii(job)*7) % 23) % 3 = 0 THEN 1 ELSE 0 END
            WHEN 'grant'       THEN CASE WHEN ((length(job)*31 + ascii(job)*7) % 23) % 19 = 0 THEN 2 ELSE ((length(job)*31 + ascii(job)*7) % 23) % 2 END
            ELSE 0 END AS fc
        FROM jobs),
      gate AS (
        SELECT stage,
          sum(CASE WHEN fc <= max_retries THEN 0 ELSE 1 END) * 100
            <= any_value(tolerance_pct) * count(*) AS local_ok
        FROM scripted GROUP BY stage),
      skipflag AS (
        SELECT a.stage, max(CASE WHEN g.local_ok THEN 0 ELSE 1 END) = 1 AS skip
        FROM anc a JOIN gate g ON a.anc_stage = g.stage GROUP BY a.stage),
      st AS (
        SELECT g.stage,
          CASE WHEN coalesce(k.skip, FALSE) THEN 'SKIPPED'
               WHEN g.local_ok THEN 'DONE' ELSE 'FAILED' END AS stage_status
        FROM gate g LEFT JOIN skipflag k ON g.stage = k.stage)
      SELECT j.stage, j.job, CAST(j.wave AS BIGINT) AS wave,
        CAST(CASE WHEN st.stage_status = 'SKIPPED' THEN 0
          ELSE least(j.fc + 1, j.max_retries + 1) END AS BIGINT) AS attempts,
        CASE WHEN st.stage_status = 'SKIPPED' THEN 'SKIPPED'
             WHEN j.fc <= j.max_retries THEN 'DONE' ELSE 'FAILED' END AS outcome,
        st.stage_status
      FROM scripted j JOIN st ON j.stage = st.stage
      ORDER BY j.stage, j.job"""
  }
}
