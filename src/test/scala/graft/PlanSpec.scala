package graft

import graft.relational.Relational
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions (SURVEY §4 acceptance bar): parquet pushdown
  * and pruning actually reach the scan, dims actually broadcast, top-k
  * actually plans as TakeOrderedAndProject, and no query collapses into a
  * cartesian product.
  */
class PlanSpec extends AnyFunSuite {
  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1_agg pushes the shipdate filter and prunes columns at the scan") {
    val df = Relational.q1Agg(TestSpark.spark, TestSpark.sf)
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"), p)
    // pruned: the 11-column table is read with only the 7 needed columns
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double"), p)
    assert(!p.contains("l_orderkey"), "scan should not read l_orderkey\n" + p)
    // whole-stage codegen only shows in the final adaptive plan, post-execution
    // (rendered as "*(n)" stage markers in the plan string)
    df.collect()
    assert(plan(df).contains("*("), plan(df))
  }

  test("q5_join broadcasts every dim and shuffles only lineitem⋈orders") {
    val p = plan(Relational.q5Join(TestSpark.spark, TestSpark.sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q3_topk plans the limit as TakeOrderedAndProject") {
    val p = plan(Relational.q3TopK(TestSpark.spark, TestSpark.sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("range_join is a broadcast nested loop, not a shuffled cartesian") {
    val p = plan(Relational.rangeJoin(TestSpark.spark, TestSpark.sf))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("range_join_banded is a bucket equi-join: no BNLJ, no cartesian, no broadcast of a fact") {
    val p = plan(Relational.rangeJoinBanded(TestSpark.spark, TestSpark.sf))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the residual BETWEEN rides on a hash/sort-merge EQUI join on bucket
    assert(p.contains("bucket"), p)
  }

  test("partitioned_scan prunes to the filtered lang partitions") {
    val s = TestSpark.spark
    val path = java.nio.file.Files.createTempDirectory("partdocs").toString
    graft.etl.PartitionedLayout.writePartitioned(
      graft.Tables.documents(s, TestSpark.sf), path, "lang")
    val p = plan(graft.etl.PartitionedLayout.prunedScan(s, path))
    assert(p.contains("PartitionFilters: [") && p.contains("lang"), p)
    // the lang predicate must be a partition filter, not a data filter
    val scan = p.split("\n").find(_.contains("FileScan")).getOrElse(p)
    assert(!scan.replaceAll(".*PartitionFilters", "").startsWith(": []"), p)
  }

  test("asof_join is one shuffle + window, no per-event probe join") {
    val p = plan(Relational.asofJoin(TestSpark.spark, TestSpark.sf))
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("asof_join_native plans the custom AsOfJoin exec and matches the composed form") {
    val df = Relational.asofJoinNative(TestSpark.spark, TestSpark.sf)
    val p = plan(df)
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("Window"), "the native node replaces the union-window composition: " + p)
    val native = df.collect().map(_.toString).toSeq
    val composed = Relational.asofJoin(TestSpark.spark, TestSpark.sf).collect().map(_.toString).toSeq
    assert(native == composed, "merge-scan exec must agree with the composed query")
  }

  test("q_kmv_distinct pushes a map-side WindowGroupLimit before the shuffle") {
    val df = Relational.qKmvDistinct(TestSpark.spark, TestSpark.sf)
    df.collect()
    val p = plan(df)
    // the dense_rank<=k filter must become the partial (pre-exchange)
    // group-limit: each map task ships only its k smallest hashes per
    // group — the distributed KMV merge, planned by Catalyst
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"), p)
  }

  test("q_waiting scans lineitem once — correlated EXISTS folded into one pass") {
    val p = plan(Relational.qWaiting(TestSpark.spark, TestSpark.sf))
    val lineitemScans = p.split("\n").count(l => l.contains("FileScan") && l.contains("lineitem"))
    assert(lineitemScans == 1, s"expected 1 lineitem scan, got $lineitemScans\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_volume broadcasts the nation dim twice and never goes cartesian") {
    val p = plan(Relational.qVolume(TestSpark.spark, TestSpark.sf))
    // the (A,B)/(B,A) disjunction must land on a BroadcastHashJoin's
    // post-join condition, not force a nested-loop or cartesian plan
    // match n_nationkey, not "nation": customer/supplier scans carry
    // c_nationkey/s_nationkey columns and would inflate the count
    val nationBroadcasts = p.split("\n").count(l =>
      l.contains("FileScan") && l.contains("n_nationkey"))
    assert(nationBroadcasts == 2, s"expected 2 nation scans (supp+cust side), got $nationBroadcasts\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_marketshare aggregates numerator and denominator in one pass") {
    val p = plan(Relational.qMarketshare(TestSpark.spark, TestSpark.sf))
    // one lineitem scan: the CASE numerator shares the denominator's
    // aggregation rather than joining two separately-aggregated queries
    val lineitemScans = p.split("\n").count(l => l.contains("FileScan") && l.contains("lineitem"))
    assert(lineitemScans == 1, s"expected 1 lineitem scan, got $lineitemScans\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("stream_interval_join is an equi-join on the key, never a cartesian") {
    val p = plan(graft.streaming.Streams.intervalJoinQuery(TestSpark.spark, TestSpark.sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("dedup_spans marks windows via hash-equality join, never doc×doc") {
    val p = plan(graft.ops.Dedup.spans(TestSpark.spark, TestSpark.sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("dedup_embedding_lsh joins candidates per bucket, never all-pairs") {
    val p = plan(graft.ops.Similarity.dedupEmbeddingLsh(TestSpark.spark, TestSpark.sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("semdedup pairs only within (label, table, bucket), never all-pairs") {
    val p = plan(graft.ops.Similarity.semDedup(TestSpark.spark, TestSpark.sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("domain_mix: totals reuse the stratum exchange, no global window") {
    val df = graft.ops.Curate.domainMix(TestSpark.spark, TestSpark.sf)
    // no whole-frame window anywhere (the r9 form moved the stratum frame
    // to a single partition for the totals)
    assert(!plan(df).contains("Window"), plan(df))
    df.collect()
    // ...and at runtime the grand-total branch consumes the SAME lang
    // exchange instead of re-scanning the corpus
    assert(plan(df).contains("ReusedExchange"), plan(df))
  }

  test("q_bigorders: having-aggregate first, top-100 as TakeOrderedAndProject") {
    val p = plan(Relational.qBigorders(TestSpark.spark, TestSpark.sf))
    assert(p.contains("TakeOrderedAndProject"), p)
    // exactly one lineitem scan — the HAVING feeds the join, it is not
    // re-derived per consumer
    val lineitemScans = p.split("\n").count(l => l.contains("FileScan") && l.contains("lineitem"))
    assert(lineitemScans == 1, s"expected 1 lineitem scan, got $lineitemScans\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_disjunct pushes the union-of-branches bounds to both scans") {
    val p = plan(Relational.qDisjunct(TestSpark.spark, TestSpark.sf))
    // the quantity band (implied by all three OR branches) reaches the
    // lineitem scan; the brand/size bounds reach the part scan
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,1.0), LessThanOrEqual(l_quantity,30.0)") ||
      p.contains("GreaterThanOrEqual(l_quantity,1.0)"), p)
    assert(p.contains("In(p_brand") || p.contains("EqualTo(p_brand"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_idle: date bound pushed to the orders scan, anti join is hash-based") {
    val p = plan(Relational.qIdle(TestSpark.spark, TestSpark.sf))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), p)
    assert(p.contains("LeftAnti"), p)
    // the only nested-loop is the 1-row broadcast stats scalar; the anti
    // join itself must be hash-based and nothing may plan a cartesian
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_forecast: all three predicate families reach the lineitem scan") {
    val p = plan(graft.relational.TpchGaps.qForecast(TestSpark.spark, TestSpark.sf))
    // the PushedFilters list renders truncated; the three IsNotNulls plus
    // the date bound prefix prove all three families reached the scan
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), IsNotNull(l_quantity), GreaterThanOrEqual(l_shipda"), p)
    // pruned: only the 4 consumed columns are read
    assert(!p.contains("l_orderkey"), "scan should not read l_orderkey\n" + p)
  }

  test("q_priority plans the EXISTS as a LeftSemi, date bound pushed to orders") {
    val p = plan(graft.relational.TpchGaps.qPriority(TestSpark.spark, TestSpark.sf))
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), p)
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_returns: top-20 is TakeOrderedAndProject over customer-grain aggregates") {
    val p = plan(graft.relational.TpchGaps.qReturns(TestSpark.spark, TestSpark.sf))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_profit: name filter pushed to part, dims broadcast, no cartesian") {
    val p = plan(graft.relational.TpchGaps.qProfit(TestSpark.spark, TestSpark.sf))
    assert(p.contains("StringStartsWith(p_name,blue)"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_smallqty: the per-part threshold joins back hash-based, brand semi-join pushed") {
    val p = plan(graft.relational.TpchGaps.qSmallqty(TestSpark.spark, TestSpark.sf))
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("EqualTo(p_brand,Brand#11)"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
