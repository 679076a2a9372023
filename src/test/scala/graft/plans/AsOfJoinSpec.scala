package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B13b edge semantics, pinned on crafted rows (PlanSpec separately
  * bit-compares the exec against the composed form on real data).
  */
class AsOfJoinSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("inclusive boundary, largest-tiebreak and no-match rows") {
    import s.implicits._
    // right: user 1 orders at t=10 (ids 100 and 101 tied — 101 must win)
    // and t=20 (id 102); user 2 has no orders at all
    val e = Seq(
      (1L, 5L, 50L), (1L, 10L, 51L), (1L, 15L, 52L), (1L, 25L, 53L),
      (2L, 10L, 60L)
    ).toDF("k", "t", "event_id").withColumn("ts", timestamp_micros(col("t")))
    val o = Seq(
      (1L, 10L, 100L), (1L, 10L, 101L), (1L, 20L, 102L)
    ).toDF("rk", "rt", "o_orderkey")
      .withColumn("o_total", col("o_orderkey").cast("decimal(12,2)"))
    val out = graft.relational.Relational.asofJoinNativeOn(s, e, o).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out(50L) == -1L, "event before any order matches nothing")
    assert(out(51L) == 101L, "t=10 is inclusive and the larger tied order id wins")
    assert(out(52L) == 101L, "t=15 still sees the t=10 order")
    assert(out(53L) == 102L, "t=25 advances to the t=20 order")
    assert(out(60L) == -1L, "user with no orders matches nothing")
  }

  test("native merge scan equals a reference lookup on random data") {
    import s.implicits._
    // seeded LCG over tight key/time domains: dense ties, empty keys,
    // interleaved runs — the shapes the per-partition merge scan has to
    // get right and crafted rows can't enumerate
    var state = 7L
    def nxt(bound: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 33) % bound).toInt + bound) % bound
    }
    (1 to 5).foreach { trial =>
      val nE = 30 + nxt(40)
      val nO = 20 + nxt(40)
      val events = (0 until nE).map(i => (nxt(5).toLong, nxt(20).toLong, 1000L + i))
      val orders = (0 until nO).map(i => (nxt(5).toLong, nxt(20).toLong, 2000L + i))
      val e = events.toDF("k", "t", "event_id")
        .withColumn("ts", timestamp_micros(col("t")))
      val o = orders.toDF("rk", "rt", "o_orderkey")
        .withColumn("o_total", col("o_orderkey").cast("decimal(12,2)"))
      val got = graft.relational.Relational.asofJoinNativeOn(s, e, o).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      // reference: latest order at-or-before, ties by largest order id
      val want = events.map { case (k, t, id) =>
        val m = orders.filter(o => o._1 == k && o._2 <= t)
        id -> (if (m.isEmpty) -1L
               else m.maxBy(o => (o._2, o._3))._3)
      }.toMap
      assert(got == want, s"trial $trial: events=$events orders=$orders")
    }
  }
}
