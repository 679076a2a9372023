package graft.etl

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Property test for the A29 runtime: on seeded RANDOM topologies —
  * not just the fixed mirror pipeline — the concurrent executor's trace
  * must equal an independent sequential interpreter written with none of
  * the runner's machinery (no threads, no semaphores, no latches). Any
  * scheduling bug that lets a stage start early, double-run a job, drop
  * a retry, or mis-propagate a skip shows up as a relation mismatch on
  * some topology.
  */
class DagPropSpec extends AnyFunSuite {
  import Dag._

  private def failCount(seed: Int, stage: String, job: String): Int =
    Math.floorMod(stage.hashCode * 31 + job.hashCode * 17 + seed, 4)

  private def randomDag(rnd: Random): (Seq[StageDef], Map[String, Seq[String]]) = {
    val n = 5 + rnd.nextInt(8)
    val names = (0 until n).map(i => s"st$i")
    val stages = names.zipWithIndex.map { case (nm, i) =>
      val deps = names.take(i).filter(_ => rnd.nextDouble() < 0.35)
      StageDef(nm, deps, 1 + rnd.nextInt(4), rnd.nextInt(3),
        Seq(0, 10, 25, 50)(rnd.nextInt(4)))
    }
    val jobs = names.map(nm =>
      nm -> (0 until (1 + rnd.nextInt(20))).map(j => s"job_$j")).toMap
    (stages, jobs)
  }

  /** The oracle: sequential, single-threaded, no shared state. */
  private def interpret(seed: Int, stages: Seq[StageDef],
                        jobs: Map[String, Seq[String]]): (Set[(String, String, Int, String)], Map[String, String]) = {
    val status = collection.mutable.Map[String, String]()
    val trace = collection.mutable.Set[(String, String, Int, String)]()
    stages.foreach { st => // Seq order is topological by construction
      if (!st.deps.forall(d => status(d) == "DONE")) {
        status(st.name) = "SKIPPED"
        jobs(st.name).foreach(j => trace += ((st.name, j, 0, "SKIPPED")))
      } else {
        var failed = 0
        jobs(st.name).foreach { j =>
          val fc = failCount(seed, st.name, j)
          val ok = fc <= st.maxRetries
          val attempts = math.min(fc + 1, st.maxRetries + 1)
          if (!ok) failed += 1
          trace += ((st.name, j, attempts, if (ok) "DONE" else "FAILED"))
        }
        status(st.name) =
          if (failed.toLong * 100 <= st.tolerancePct.toLong * jobs(st.name).size) "DONE"
          else "FAILED"
      }
    }
    (trace.toSet, status.toMap)
  }

  test("concurrent executor equals the sequential interpreter on 30 random DAGs") {
    (1 to 30).foreach { seed =>
      val rnd = new Random(seed * 7919)
      val (stages, jobs) = randomDag(rnd)
      val (expTrace, expStatus) = interpret(seed, stages, jobs)
      val res = Dag.run(stages, jobs, (st, j, attempt) =>
        if (attempt <= failCount(seed, st, j))
          throw new RuntimeException(s"injected $st/$j/$attempt"))
      val gotTrace = res.jobs.map(r => (r.stage, r.job, r.attempts, r.outcome)).toSet
      val gotStatus = res.stages.map { case (k, v) => k -> v.status }
      assert(gotTrace == expTrace, s"trace mismatch at seed $seed: ${stages.map(s => s.name -> s.deps)}")
      assert(gotStatus == expStatus, s"status mismatch at seed $seed")
      // every job accounted for exactly once
      assert(res.jobs.size == jobs.values.map(_.size).sum, s"job count at seed $seed")
    }
  }

  test("waves/ancestors agree with a brute-force longest-path/BFS on random DAGs") {
    (1 to 20).foreach { seed =>
      val rnd = new Random(seed * 104729)
      val (stages, _) = randomDag(rnd)
      val deps = stages.map(s => s.name -> s.deps.toSet).toMap
      def bruteAnc(n: String): Set[String] =
        deps(n) ++ deps(n).flatMap(bruteAnc)
      def bruteWave(n: String): Int =
        if (deps(n).isEmpty) 1 else 1 + deps(n).map(bruteWave).max
      val wv = waves(stages)
      val anc = ancestors(stages)
      stages.foreach { s =>
        assert(wv(s.name) == bruteWave(s.name))
        assert(anc(s.name) == bruteAnc(s.name))
      }
    }
  }
}
