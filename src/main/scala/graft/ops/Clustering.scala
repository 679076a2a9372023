package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** D14: duplicate-group resolution — the step the reference pipeline (and
  * any near-dup detector) needs AFTER candidate pairs are verified: collapse
  * the pair list into connected components so each dup group gets one
  * canonical representative.
  *
  * Algorithm: iterative min-label propagation with per-round pointer
  * jumping. Every vertex starts labelled with itself; each round every
  * vertex takes the min label over itself and its neighbours, then follows
  * its label one extra hop (comp := label[comp]) — the jump compounds
  * progress geometrically, so rounds are O(log diameter) rather than
  * O(diameter) (the same doubling idea as Shiloach-Vishkin / the
  * large-star contraction of Kiveris et al.). Converged when no label
  * changes. Per round the work is one shuffle join (edges ⋈ labels), one
  * shuffle min-agg, and one self-join on the (shrinking-entropy) label
  * relation, all keyed on the vertex id; the edge list is cached once and
  * `localCheckpoint` truncates the lineage each round so the plan doesn't
  * grow with iteration count. LSH dedup graphs (cliques/stars from
  * Dedup.cappedPairs) converge in 2-4 rounds; the default 25-round cap
  * covers diameters up to ~2^25 and non-convergence throws rather than
  * returning partial labels.
  */
object Clustering {

  /** Free the RDD blocks behind a `localCheckpoint`'d Dataset NOW.
    * `Dataset.unpersist` is a silent no-op here: localCheckpoint persists
    * the backing RDD directly (RDD-level), which the CacheManager never
    * registers, so only ContextCleaner-after-GC would reclaim the blocks.
    * The checkpointed plan is a `LogicalRDD` leaf — unpersist its RDD.
    * Caller must guarantee no later consumer: the lineage is truncated,
    * so a dropped block cannot be recomputed.
    */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Connected components of the undirected graph given by `edges` (cols
    * `a`, `b`). Returns (id, comp) for every vertex that appears in an
    * edge, where comp = min vertex id reachable.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val und = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Seed labels with least(id, min neighbor) rather than id: the
    // groupBy costs exactly what the old vertex-distinct init cost (one
    // shuffle on the same key), but it IS round 1's min-propagation —
    // one fewer full label-relation shuffle round at any scale (r10;
    // ClusteringPropSpec pins equivalence against union-find).
    var labels = und.groupBy("src").agg(min("dst").as("mn"))
      .select(col("src").as("id"), least(col("src"), col("mn")).as("comp"))
      .localCheckpoint()
    // the checkpoint block that currently backs `labels` — round i's blocks
    // can be dropped once round i+1's `changed` count has consumed them,
    // else checkpoint RDDs accumulate linearly with iteration count
    var backing = labels
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val msgs = und.join(labels, und("src") === labels("id"))
        .select(col("dst").as("id"), col("comp"))
      // checkpoint before the self-join below: truncates lineage AND gives
      // the two join sides independent plans (a raw self-join of the
      // union+agg plan trips Catalyst's Union constraint rewrite)
      val prop = labels.union(msgs).groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint()
      // Pointer jump: every label value is itself a vertex id, so follow it
      // one hop (comp := label[comp]). Label propagation alone needs
      // diameter rounds; the jump compounds the progress geometrically,
      // which is what keeps round counts sane on chain-shaped components.
      // Materialized ONCE per round WITH the per-vertex changed flag
      // fused in (comp != previous label): the old loop left the jump
      // lazy, so the changed-count job ran the self-join once and the
      // next round's propagation ran it again — twice the label-relation
      // shuffle per round. The convergence probe is now a scan of the
      // materialized blocks, and the payload every round shuffles stays
      // two longs + a boolean per vertex.
      val next = prop.as("p")
        .join(prop.select(col("id").as("jid"), col("comp").as("jcomp")).as("j"),
          col("p.comp") === col("j.jid"), "left")
        .join(labels.select(col("id").as("oid"), col("comp").as("ocomp")),
          col("p.id") === col("oid"))
        .select(col("p.id").as("id"),
          coalesce(col("j.jcomp"), col("p.comp")).as("comp"),
          (coalesce(col("j.jcomp"), col("p.comp")) =!= col("ocomp")).as("chg"))
        .localCheckpoint()
      val changed = next.filter(col("chg")).limit(1).count()
      // `next` is materialized, so neither `prop`'s blocks nor the
      // previous round's have a remaining consumer — drop both at the
      // RDD level (Dataset.unpersist wouldn't; see unpersistCheckpoint)
      unpersistCheckpoint(prop)
      unpersistCheckpoint(backing)
      backing = next
      labels = next.select("id", "comp")
      converged = changed == 0
      iter += 1
    }
    und.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds")
    // `labels` is a projection over the LAST round's checkpoint blocks;
    // materialize the (tiny — one (id, comp) pair per vertex) result into
    // its own checkpoint so that round's blocks can be freed too. The
    // returned Dataset's own blocks are reclaimed by ContextCleaner once
    // the caller drops the reference.
    val out = labels.localCheckpoint()
    unpersistCheckpoint(backing)
    out
  }

  /** Incremental connected components: merge a batch of new edges into an
    * existing (id, comp) labelling WITHOUT recomputing over the full edge
    * set — the daily-increment shape of a 100 TB dedup corpus (yesterday's
    * groups + today's crawl's new pair edges).
    *
    * Correctness: contracting every existing component to its label is
    * component-preserving (labels partition the old graph into connected
    * pieces), so CC over the CONTRACTED new edges — each endpoint replaced
    * by its existing label, unseen vertices by themselves — yields exactly
    * the merged components. Because old labels are min-member-ids and new
    * vertices carry their own ids, the merged component label is again the
    * global min id, i.e. bit-identical to a full recompute (asserted in
    * ClusteringSpec and the 500k-doc stress).
    *
    * Cost: two hash joins of the new-edge batch against the labelling
    * (shuffle bounded by |batch| + |labels|) plus iterative CC on a graph
    * with one vertex per TOUCHED component/new vertex — typically orders
    * of magnitude smaller than the corpus. Unreferenced components pass
    * through untouched.
    */
  def incrementalComponents(labels: DataFrame, newEdges: DataFrame): DataFrame = {
    val l = labels.select(col("id"), col("comp"))
    val contracted = newEdges.select(col("a"), col("b"))
      .join(l.select(col("id").as("a"), col("comp").as("ca")), Seq("a"), "left")
      .join(l.select(col("id").as("b"), col("comp").as("cb")), Seq("b"), "left")
      .select(coalesce(col("ca"), col("a")).as("a"), coalesce(col("cb"), col("b")).as("b"))
    val merged = connectedComponents(contracted)
    // old members re-label through their component's new label; components
    // the batch never touched fall through the left join unchanged
    val relabeled = l
      .join(merged.select(col("id").as("comp"), col("comp").as("newcomp")), Seq("comp"), "left")
      .select(col("id"), coalesce(col("newcomp"), col("comp")).as("comp"))
    // vertices the batch introduced (present in the contracted graph but
    // not in the old labelling)
    val fresh = merged.join(l.select("id"), Seq("id"), "left_anti")
    relabeled.unionByName(fresh)
  }

  /** D14 query: dup groups over the union of exact-dup pairs (normalized
    * content hash) and verified n-gram-jaccard near-dup pairs. Output one
    * row per grouped doc: (doc_id, comp = min id in group, group_n).
    *
    * The jaccard stage runs on RAW-text representatives only: byte-equal
    * texts have identical length bands AND identical shingle sets, so a
    * copy's near-dup link is implied by rep—rep link + exact edges and
    * the connected components are provably unchanged — while the
    * within-band quadratic verify shrinks from (copies·uniques)² to
    * uniques² (the replicated 10× stress: 100×). Two subtleties, both
    * caught by the sf0.1 oracle run: the collapse key must be the RAW
    * text (a whitespace/case variant keeper can sit in a different length
    * band than its members), and the representative must inherit EVERY
    * lang label of its raw group — the corpus carries byte-identical
    * texts under different langs, and banding keys on lang, so a
    * single-label rep would lose its twins' cross-lang candidates. With
    * one rep row per (raw text, lang), every band input of every member
    * (lang, n_chars, shingle set) survives the collapse and the
    * components are exactly those of the full edge set.
    */
  /** E6/D14b: best-representative selection — the step AFTER group
    * resolution in a real curation pipeline: instead of keeping the
    * min-id doc of each dup group, keep the HIGHEST-QUALITY one
    * (quality_score, ties to min doc_id). Pure composition of
    * `dedupGroups` and `TextAnalysis.qualityScore`: one join on doc_id +
    * a rank-1 window over the (tiny, one row per grouped doc) labelled
    * relation — the expensive parts are the operators already measured.
    */
  def keepBest(s: SparkSession, d: String): DataFrame = {
    val quality = TextAnalysis.qualityScore(s, d).select(col("doc_id"), col("score"))
    val w = Window.partitionBy("comp").orderBy(col("score").desc, col("doc_id"))
    dedupGroups(s, d)
      .join(quality, "doc_id")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("comp"), col("doc_id").as("best_doc"), col("score"), col("group_n"))
      .orderBy("comp")
  }

  /** D31: PageRank-style centrality over the candidate-pair similarity
    * graph — the "most central representative" signal next to E6's
    * dedup_keep_best: inside a near-dup neighbourhood, the doc similar to
    * the most other docs. Fixed-point integer arithmetic throughout
    * (rank ×1e6, damping 85/100, truncating DIV), so the 3 unrolled
    * iterations replay bit-exactly in DuckDB CTEs — no FP convergence
    * tolerance anywhere.
    *
    * Shape at 100 TB: edges are D4's capped banded candidates (never
    * doc×doc), checkpointed ONCE; each iteration is one vertex-keyed
    * shuffle join + one partial-agg sum, and the plan stays 3 joins deep
    * instead of growing with a convergence loop. The bucket cap also
    * bounds degree, which bounds every per-vertex contribution sum well
    * below long overflow at any corpus size. Dangling mass is absent by
    * construction (every vertex has deg ≥ 1 — it came from an edge).
    */
  def graphRankOn(und: DataFrame): DataFrame = {
    val edges = und.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    var ranks = deg.select(col("src").as("v"), lit(1000000L).as("r"))
    for (_ <- 1 to 3) {
      val contrib = edges
        .join(deg, "src")
        .join(ranks.withColumnRenamed("v", "src"), "src")
        .select(col("dst").as("v"), expr("r DIV deg").as("c"))
        .groupBy("v").agg(sum("c").as("in_sum"))
      ranks = deg.select(col("src").as("v"))
        .join(contrib, Seq("v"), "left")
        .select(col("v"), expr("150000 + 85 * coalesce(in_sum, 0) DIV 100").as("r"))
    }
    deg.select(col("src").as("v"), col("deg"))
      .join(ranks, "v")
      .select(col("v").as("doc_id"), col("deg"), col("r").as("rank_x1e6"))
      .orderBy("doc_id")
  }

  /** D31 registered query: candidates from the same (lang, length-band)
    * blocking as D4, eager-checkpointed (pair-sized — the minhash cache
    * precedent) so the three iterations re-read a materialized edge list
    * instead of re-deriving candidates seven times.
    */
  def graphRank(s: SparkSession, d: String): DataFrame =
    graphRankOn(Dedup.bandedCandidates(
      Tables.documents(s, d).select("doc_id", "lang", "n_chars")).localCheckpoint())

  def dedupGroups(s: SparkSession, d: String): DataFrame = {
    // fanOut: both normalization hashes (md5 over regexp-normalized full
    // text) are computed map-side before any exchange — keep that CPU
    // off the input split count (identity at real split counts)
    val docs = Tables.fanOut(Tables.documents(s, d))
    // Shuffle KEYS, not payloads (guide §2.3): the old form ran two
    // windows and a distinct over rows CARRYING the full text — three
    // corpus-payload shuffles to learn facts that depend only on
    // (doc_id, lang, two 128-bit content hashes). `slim` computes both
    // hashes in one map pass and is materialized once; every grouping
    // below moves ~50-byte rows. The text itself is re-attached ONLY
    // for the representatives, via a join the planner can broadcast
    // (reps ≪ corpus), so at any scale the payload crosses the wire at
    // most once here instead of three times.
    val slim = docs
      .select(col("doc_id"), col("lang"),
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("h1"),
        md5(col("text")).as("h2"))
      .localCheckpoint()
    val k1 = slim.groupBy("h1").agg(min("doc_id").as("keeper"))
    val exactPairs = slim.join(k1, "h1").filter(col("doc_id") =!= col("keeper"))
      .select(col("keeper").as("a"), col("doc_id").as("b"))
    // one row per (raw text, lang), exactly as before: the rep is the
    // min doc_id of its byte-identical group and inherits EVERY lang
    // label the group carries (banding keys on lang — see scaladoc)
    val k2 = slim.groupBy("h2").agg(min("doc_id").as("rep"))
    val repLang = slim.select("h2", "lang").distinct()
      .join(k2, "h2")
      .select(col("rep").as("doc_id"), col("lang"))
    val rawReps = repLang
      .join(docs.select("doc_id", "n_chars", "text"), "doc_id")
      .select("doc_id", "lang", "n_chars", "text")
    val jaccPairs = Dedup.ngramJaccardOn(rawReps).select("a", "b")
    val edges = exactPairs.union(jaccPairs).distinct()
    connectedComponents(edges)
      .withColumn("group_n", count(lit(1)).over(Window.partitionBy("comp")))
      .select(col("id").as("doc_id"), col("comp"), col("group_n"))
      .orderBy("doc_id")
  }
}
