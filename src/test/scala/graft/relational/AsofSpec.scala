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

  test("NULL keys and timestamps never match, identically in composed and native forms") {
    val s = TestSpark.spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("asofnull").toString
    // null custkey and null orderdate orders can never match; user 7 has
    // one real prior order the non-null event must still find
    Seq(
      (200L, Option(7L), "F", 10.0, Option(Timestamp.valueOf("2020-01-01 00:00:00")), "1-URGENT"),
      (201L, Option.empty[Long], "F", 20.0, Option(Timestamp.valueOf("2020-01-01 00:00:00")), "1-URGENT"),
      (202L, Option(7L), "F", 30.0, Option.empty[Timestamp], "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    Seq(
      (10L, Option(Timestamp.valueOf("2021-01-01 00:00:00")), Option(7L), "click", 0.5, "{}"),
      (11L, Option(Timestamp.valueOf("2021-01-01 00:00:00")), Option.empty[Long], "click", 0.5, "{}"),
      (12L, Option.empty[Timestamp], Option(7L), "click", 0.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")

    def matches(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = df.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    val composed = matches(Relational.asofJoin(s, tmp))
    assert(composed(10L) == 200L, "non-null event must still match its prior order")
    assert(composed(11L) == -1L, "null-key event must not match a null-key order")
    assert(composed(12L) == -1L, "null-ts event must not match")
    // the native exec must agree row for row (its null guards implement
    // the same SQL semantics the oracle's equi-join gives)
    assert(matches(Relational.asofJoinNative(s, tmp)) == composed)
  }
}
