package graft.relational

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MovingSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("q_moving trails exactly 7 days by event time, per user") {
    import s.implicits._
    // user 1: events at day 0, 3, 8, 20 — at day 8 the day-0 event has
    // aged out (8 > 7) but day-3 remains; at day 20 only itself.
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 1L, 10.0),
      (2L, "2024-01-04 00:00:00", 1L, 20.0),
      (3L, "2024-01-09 00:00:00", 1L, 40.0),
      (4L, "2024-01-21 00:00:00", 1L, 80.0),
      (5L, "2024-01-09 00:00:00", 2L, 1.0) // other user: isolated partition
    ).toDF("event_id", "tss", "user_id", "value")
      .select(col("event_id"), to_timestamp(col("tss")).as("ts"), col("user_id"),
        col("value"), lit("click").as("event_type"), lit("{}").as("props"))
    val tmp = java.nio.file.Files.createTempDirectory("mov").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Relational.qMoving(s, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getDouble(4)))).toMap
    assert(out(1L) == ((1L, 10.0)))
    assert(out(2L) == ((2L, 30.0)), "day 0 + day 3 both inside 7 days")
    assert(out(3L) == ((2L, 60.0)), "day 0 aged out, day 3 retained")
    assert(out(4L) == ((1L, 80.0)), "all prior events aged out")
    assert(out(5L) == ((1L, 1.0)), "window never crosses users")
  }
}
