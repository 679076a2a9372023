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
}
