package graft.functions

import graft.{Tables, TestSpark}
import graft.relational.Relational
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** B30: the bounded top-k aggregate must agree with the window form
  * bit-for-bit under any partitioning, and the buffer must implement the
  * exact (key DESC, payload ASC) total order through offer/merge.
  */
class TopKSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("buffer keeps the k best pairs under the (key desc, payload asc) order") {
    val rnd = new Random(42)
    val pairs = Array.fill(500)((rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong))
    val b = new TopKBuffer(7)
    pairs.foreach { case (k, v) => b.offer(k, v) }
    val expect = pairs.sortBy { case (k, v) => (-k, v) }.take(7)
    val got = (0 until b.size).map(i => (b.keys(i), b.vals(i)))
    assert(got == expect.toSeq, s"got $got")
  }

  test("merge of split streams equals the unsplit buffer") {
    val rnd = new Random(7)
    val pairs = Array.fill(300)((rnd.nextInt(20).toLong, rnd.nextLong()))
    val whole = new TopKBuffer(5)
    pairs.foreach { case (k, v) => whole.offer(k, v) }
    val (l, r) = pairs.splitAt(137)
    val lb = new TopKBuffer(5); l.foreach { case (k, v) => lb.offer(k, v) }
    val rb = new TopKBuffer(5); r.foreach { case (k, v) => rb.offer(k, v) }
    (0 until rb.size).foreach(i => lb.offer(rb.keys(i), rb.vals(i)))
    assert((0 until lb.size).map(i => (lb.keys(i), lb.vals(i))) ==
      (0 until whole.size).map(i => (whole.keys(i), whole.vals(i))))
  }

  test("q_topk_group equals the window row_number form, under any partitioning") {
    val byCust = Window.partitionBy("o_custkey")
      .orderBy(col("price_x100").desc, col("o_orderkey"))
    val windowed = Tables.orders(s, TestSpark.sf)
      .select(col("o_custkey"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long").as("price_x100"),
        col("o_orderkey"))
      .repartition(13) // adversarial: nothing about the layout may matter
      .withColumn("rnk", row_number().over(byCust).cast("long"))
      .filter(col("rnk") <= 3)
      .select("o_custkey", "rnk", "o_orderkey", "price_x100")
      .orderBy("o_custkey", "rnk")
      .collect()
    val agg = Relational.qTopkGroup(s, TestSpark.sf).collect()
    assert(agg.length == windowed.length)
    assert(agg.map(_.toSeq).toSeq == windowed.map(_.toSeq).toSeq)
  }

  test("the aggregate plans a partial aggregation before the shuffle") {
    val df = Relational.qTopkGroup(s, TestSpark.sf)
    val p = df.queryExecution.executedPlan.toString
    // ObjectHashAggregate partial_topk_pairs below the exchange: each map
    // task ships at most k pairs per group
    assert(p.contains("partial_topk_pairs"), p.take(3000))
  }
}
