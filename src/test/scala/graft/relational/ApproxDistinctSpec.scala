package graft.relational

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_approx_distinct is rows-only at the driver gate (HLL++ sketches are
  * engine-specific); this spec pins its accuracy contract instead: every
  * approximate count within 3× the default 5% relative standard deviation
  * of the exact count.
  */
class ApproxDistinctSpec extends AnyFunSuite {

  test("approx distinct counts are within HLL error bounds of exact counts") {
    val s = TestSpark.spark
    val approx = Relational.qApproxDistinct(s, TestSpark.sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.lineitem(s, TestSpark.sf)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("o"), countDistinct(col("l_partkey")).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (eOrders, eParts)) =>
      val (aOrders, aParts) = approx(k)
      assert(math.abs(aOrders - eOrders).toDouble / eOrders <= 0.15, s"$k orders: $aOrders vs $eOrders")
      assert(math.abs(aParts - eParts).toDouble / eParts <= 0.15, s"$k parts: $aParts vs $eParts")
    }
  }
}
