package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Un-staged plan builders for the registered queries that eagerly
  * `localCheckpoint` (their cache lifecycle is self-contained by design):
  * the checkpointed query documents only `Scan ExistingRDD`, hiding the
  * upstream subtree from both PLANS.md and the fleet-wide
  * CartesianProduct guard. Every builder here produces the SAME logical
  * computation with staging disabled, so plan inspection sees the whole
  * tree. Used by [[PlanDoc]] and `AllPlansSpec`.
  */
object PlanOnly {
  val builders: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_minhash" -> ((ss, dd) => graft.ops.Dedup.minhashPlan(ss, dd)),
    "graph_rank" -> ((ss, dd) => graft.ops.Clustering.graphRankOn(
      graft.ops.Dedup.bandedCandidates(
        graft.Tables.documents(ss, dd).select("doc_id", "lang", "n_chars")))),
    "curate_pipeline" -> ((ss, dd) =>
      graft.ops.Curate.pipelineStaged(ss, dd, stage = false)),
    "q_important" -> ((ss, dd) =>
      graft.relational.TpchGaps.qImportant(ss, dd, stage = false)),
    "q_excess" -> ((ss, dd) =>
      graft.relational.TpchGaps.qExcess(ss, dd, stage = false)))
}
