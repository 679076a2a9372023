package graft.plans

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning — Catalyst's InjectRuntimeFilter.
  *
  * At 100 TB the classic win: a selective dimension predicate (here
  * `o_orderpriority = '1-URGENT'`) builds a bloom filter over the join
  * keys at runtime, and the FACT side's scan/shuffle drops non-matching
  * rows BEFORE the join exchange — the fact side never ships rows the
  * join would discard. This is free engine behavior as long as the plan
  * stays declarative; the spec pins that our join shapes actually
  * trigger it (thresholds scoped down because local test relations are
  * tiny; production sizes clear the defaults on their own).
  */
class RuntimeFilterSpec extends AnyFunSuite {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val s = TestSpark.spark
    val prev = pairs.map { case (k, _) => k -> s.conf.getOption(k) }
    pairs.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  private def joined() = {
    val s = TestSpark.spark
    val d = TestSpark.sf
    Tables.lineitem(s, d).join(
      Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
      col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("l_quantity").cast("long").as("qty"))
  }

  test("a selective dim predicate injects a bloom filter into the fact scan side") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = joined().queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("BloomFilterMightContain"),
        s"no runtime bloom filter injected:\n$plan")
    }
  }

  test("filtered and unfiltered forms agree (the filter only prunes, never drops matches)") {
    val s = TestSpark.spark
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)))).collect()(0).getLong(0)
    var on = 0L
    var off = 0L
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") { on = sig(joined()) }
    withConfs("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
      off = sig(joined())
    }
    assert(on == off)
  }
}
