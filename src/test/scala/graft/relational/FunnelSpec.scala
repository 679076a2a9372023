package graft.relational

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B27 q_funnel: stage timestamps must be STRICTLY ordered — a click
  * before the first view (or tied with it) must not advance the funnel.
  */
class FunnelSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("funnel stages require strictly increasing view → click → purchase") {
    import s.implicits._
    val ev = Seq(
      // user 1: clean view → click → purchase = stage 3
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 11:00:00", 1L, "click"),
      (3L, "2024-01-01 12:00:00", 1L, "purchase"),
      // user 2: click BEFORE first view never counts = stage 1
      (4L, "2024-01-01 09:00:00", 2L, "click"),
      (5L, "2024-01-01 10:00:00", 2L, "view"),
      (6L, "2024-01-01 11:00:00", 2L, "purchase"),
      // user 3: purchase before the click stage = stage 2
      (7L, "2024-01-01 09:00:00", 3L, "purchase"),
      (8L, "2024-01-01 10:00:00", 3L, "view"),
      (9L, "2024-01-01 11:00:00", 3L, "click"),
      // user 4: never viewed = stage 0
      (10L, "2024-01-01 10:00:00", 4L, "error"),
      // user 5: click TIED with view (strict > rejects it) = stage 1
      (11L, "2024-01-01 10:00:00", 5L, "view"),
      (12L, "2024-01-01 10:00:00", 5L, "click")
    ).toDF("event_id", "tss", "user_id", "event_type")
      .select(col("event_id"), to_timestamp(col("tss")).as("ts"), col("user_id"),
        col("event_type"), lit(1.0).as("value"), lit("{}").as("props"))
    val tmp = java.nio.file.Files.createTempDirectory("funnel").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Relational.qFunnel(s, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 4L -> 0L, 5L -> 1L), out.toString)
  }

  test("q_histogram puts min in bucket 0, max in bucket 9, integer edges exact") {
    import s.implicits._
    // cents 100..1000, width 901: bucket(v) = (v-100)*10 DIV 901
    val li = (1 to 10).map(i => i.toDouble).toDF("l_extendedprice")
    val tmp = java.nio.file.Files.createTempDirectory("hist").toString
    li.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Relational.qHistogram(s, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val want = (1 to 10).map(i => (i * 100L - 100L) * 10L / 901L)
      .groupBy(identity).map { case (b, o) => b -> o.size.toLong }
    assert(out == want, s"got $out want $want")
    assert(out.keySet.min == 0L && out.keySet.max == 9L)
  }
}
