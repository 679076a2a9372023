package graft.etl

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A24/A25 maintenance law, checked in-engine (the DuckDB oracle checks
  * the same law cross-engine): merged snapshot+delta state equals the
  * full recompute, bit-for-bit.
  */
class IncrementalSpec extends AnyFunSuite {

  test("partial-aggregate merge equals full recompute") {
    val s = TestSpark.spark
    val inc = Incremental.statsIncremental(s, TestSpark.sf).collect()
    val full = Tables.orders(s, TestSpark.sf)
      .select(col("o_orderpriority").as("grp"),
        round(col("o_totalprice") * 100).cast("long").as("rev_c"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_orders"), sum("rev_c").as("rev_cents"),
        min("rev_c").as("min_cents"), max("rev_c").as("max_cents"))
      .withColumn("avg_cents", expr("rev_cents DIV n_orders"))
      .orderBy("grp").collect()
    assert(inc.toSeq == full.toSeq && inc.nonEmpty)
  }

  test("delta-join view maintenance equals the full join") {
    val s = TestSpark.spark
    val inc = Incremental.ivmJoin(s, TestSpark.sf).collect()
    val full = Tables.orders(s, TestSpark.sf)
      .select(col("o_custkey"), round(col("o_totalprice") * 100).cast("long").as("rev_c"))
      .join(Tables.customer(s, TestSpark.sf), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, TestSpark.sf),
        col("c_nationkey").cast("long") === col("n_nationkey").cast("long"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_orders"), sum("rev_c").as("rev_cents"))
      .orderBy("n_name").collect()
    assert(inc.toSeq == full.toSeq && inc.nonEmpty)
  }
}
