package graft.relational

import graft.TestSpark
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

/** Pins the as-of join's edge semantics independently of the oracle:
  * no-prior-order → nulls; same-date order tie → max orderkey wins
  * (matches the oracle's ORDER BY date DESC, orderkey DESC rank-1).
  */
class AsofSpec extends AnyFunSuite {

  test("as-of edges: no prior order → null; date tie → max orderkey") {
    val s = TestSpark.spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("asof").toString
    Seq(
      (100L, 7L, "F", 10.0, Timestamp.valueOf("2020-06-01 00:00:00"), "1-URGENT"),
      (101L, 7L, "F", 20.0, Timestamp.valueOf("2020-06-01 00:00:00"), "1-URGENT"), // tie on date
      (102L, 7L, "F", 30.0, Timestamp.valueOf("2021-01-01 00:00:00"), "1-URGENT"),
      (103L, 8L, "F", 40.0, Timestamp.valueOf("2030-01-01 00:00:00"), "1-URGENT")) // after all events
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    Seq(
      (1L, Timestamp.valueOf("2020-12-01 00:00:00"), 7L, "click", 0.5, "{}"), // after tie, before 102
      (2L, Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "click", 0.5, "{}"), // after everything
      (3L, Timestamp.valueOf("2024-01-01 00:00:00"), 8L, "click", 0.5, "{}")) // user 8: order in future
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")

    val out = Relational.asofJoin(s, tmp).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out(1L) == 101L, "date tie must resolve to max orderkey")
    assert(out(2L) == 102L)
    assert(out(3L) == -1L, "future-only orders must not match")
  }
}
