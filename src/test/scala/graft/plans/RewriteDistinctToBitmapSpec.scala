package graft.plans

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RewriteDistinctToBitmapSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private def query() = Tables.lineitem(s, TestSpark.sf)
    .groupBy("l_returnflag")
    .agg(countDistinct(col("l_partkey")).as("d"), count(lit(1)).as("n"))
    .orderBy("l_returnflag")

  test("rule rewrites countDistinct to bitmap_distinct when enabled, result unchanged") {
    val expected = query().collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(!query().queryExecution.optimizedPlan.toString.contains("bitmap_distinct"))
    s.conf.set("spark.graft.bitmapDistinct.enabled", "true")
    try {
      val rewritten = query()
      assert(rewritten.queryExecution.optimizedPlan.toString.contains("bitmap_distinct"))
      val got = rewritten.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expected)
    } finally s.conf.set("spark.graft.bitmapDistinct.enabled", "false")
  }

  test("non-integral distinct keys are left alone") {
    s.conf.set("spark.graft.bitmapDistinct.enabled", "true")
    try {
      val p = Tables.lineitem(s, TestSpark.sf)
        .agg(countDistinct(col("l_returnflag")))
        .queryExecution.optimizedPlan.toString
      assert(!p.contains("bitmap_distinct"), p)
    } finally s.conf.set("spark.graft.bitmapDistinct.enabled", "false")
  }
}
