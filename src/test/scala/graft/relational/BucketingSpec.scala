package graft.relational

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {

  test("bucketed co-located join plans with no Exchange and matches the shuffled join") {
    val s = TestSpark.spark
    Seq("li_bucketed", "o_bucketed").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) rm(loc)
    }
    val li = Tables.lineitem(s, TestSpark.sf).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "k")
    val o = Tables.orders(s, TestSpark.sf).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "k")
    Bucketing.writeBucketed(li, "li_bucketed", "k")
    Bucketing.writeBucketed(o, "o_bucketed", "k")
    // at real scale neither fact side is broadcastable — model that here,
    // otherwise the tiny test table takes the broadcast path and ignores buckets
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.coLocatedJoin(s, "li_bucketed", "o_bucketed", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      // same result as the plain (shuffled) join
      assert(joined.count() == li.join(o, "k").count())
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.sql("DROP TABLE li_bucketed"); s.sql("DROP TABLE o_bucketed")
    }
  }

  // shuffle exchanges only: the final orderBy's rangepartitioning and any
  // BroadcastExchange are not the per-key shuffle the layout eliminates
  private def hashExchanges(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  test("dedup over a corpus bucketed on the content hash plans zero shuffle") {
    val s = TestSpark.spark
    val bucketed = graft.ops.Dedup.exactBucketed(s, TestSpark.sf)
    assert(hashExchanges(bucketed) == 0,
      s"bucketed dedup must not shuffle:\n${bucketed.queryExecution.executedPlan}")
    // the flat form pays exactly the one hash shuffle the layout removes
    assert(hashExchanges(graft.ops.Dedup.exact(s, TestSpark.sf)) == 1)
    // and the result is bit-identical to dedup_exact
    val flat = graft.ops.Dedup.exact(s, TestSpark.sf).collect().toSeq
    assert(bucketed.collect().toSeq == flat)
    assert(flat.nonEmpty)
  }

  test("incremental dedup over a base bucketed on the hash plans zero shuffle") {
    val s = TestSpark.spark
    import org.apache.spark.sql.functions._
    val tag = s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9_]", "_")
    val table = s"graft_inc_base_$tag"
    Bucketing.reset(s, table)
    val h = md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("h")
    Bucketing.writeBucketed(
      Tables.documents(s, TestSpark.sf).filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id").as("old_id"), h), table, "h")
    val incoming = Tables.documents(s, TestSpark.sf).filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), h)
    val inc = graft.ops.Dedup.incrementalOn(s, s.table(table), incoming)
    inc.collect()
    assert(hashExchanges(inc) == 0,
      s"bucketed incremental dedup must not shuffle:\n${inc.queryExecution.executedPlan}")
    // bit-identical to the flat-scan form
    assert(inc.collect().toSeq ==
      graft.ops.Dedup.incremental(s, TestSpark.sf).collect().toSeq)
    Bucketing.reset(s, table)
  }
}
