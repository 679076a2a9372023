package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A14: priority lanes — the reference throttles each pipeline stage with
  * `analysis_capacity` and routes prioritised databases into faster lanes
  * (PipeConfig/LoadDBs_conf.pm:108-210; the 2..5 dataflow tiers from
  * Prioritise). Spark's native analog is FAIR scheduler pools: jobs
  * submitted under a pool share the cluster by pool weight, so a
  * `human_variation` load overtakes the bulk lane without preempting it.
  *
  * Enable with `spark.scheduler.mode=FAIR` (+ an allocation file giving
  * the pools weights) on a real cluster; pool routing itself — shown
  * here — is a thread-local property and works under any mode.
  */
object Lanes {

  /** Same tier names the reference's flow map implies ({0→2,…,3→5}). */
  val poolForFlow: Map[Int, String] = Map(
    2 -> "basic", 3 -> "high", 4 -> "highest", 5 -> "human_variation")

  /** Run `body`'s Spark jobs inside the lane for `flow`. */
  def runInLane[T](s: SparkSession, flow: Int)(body: => T): T = {
    val sc = s.sparkContext
    sc.setLocalProperty("spark.scheduler.pool", poolForFlow.getOrElse(flow, "basic"))
    try body
    finally sc.setLocalProperty("spark.scheduler.pool", null)
  }

  /** A14 query (r5, oracle-checked): the lane ROUTING — every discovered
    * db through priority scoring to its scheduler pool. The pool
    * assignment is the computable half of the reference's capacity
    * tiers (LoadDBs_conf.pm:108-210); the runtime half (jobs actually
    * running under the pool) is exercised by LanesSpec via runInLane.
    */
  def lanesQuery(s: SparkSession, d: String): DataFrame =
    Discovery.prioritise(s, d)
      .select(col("db"), col("flow"),
        element_at(typedlit(poolForFlow), col("flow").cast("int")).as("pool"))
      .orderBy("db")
}
