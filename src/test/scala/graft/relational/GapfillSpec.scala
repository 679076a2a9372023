package graft.relational

import graft.{TestSpark, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GapfillSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("gapfill emits a dense user×day grid with zero-filled counts and LOCF peaks") {
    import s.implicits._
    val ev = Seq(
      (1L, "2024-03-01 10:00:00", 1L, 5.0),
      (2L, "2024-03-01 11:00:00", 1L, 9.0),
      (3L, "2024-03-04 09:00:00", 1L, 2.0), // 2-day gap for user 1
      (4L, "2024-03-02 08:00:00", 2L, 7.0)  // user 2 active on day 2 only
    ).toDF("event_id", "tss", "user_id", "value")
      .select(col("event_id"), to_timestamp(col("tss")).as("ts"), col("user_id"),
        col("value"), lit("click").as("event_type"), lit("{}").as("props"))
    val tmp = java.nio.file.Files.createTempDirectory("gap").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Relational.qGapfill(s, tmp).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    // span 03-01..03-04 → 4 days × 2 users = 8 rows
    assert(out.length == 8)
    val u1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(u1.map(_._3).toSeq == Seq(2L, 0L, 0L, 1L), "counts zero-filled in the gap")
    assert(u1.map(_._4).toSeq == Seq(Some(9.0), Some(9.0), Some(9.0), Some(2.0)),
      "peak carried forward through the gap")
    val u2 = out.filter(_._1 == 2L).sortBy(_._2)
    assert(u2.map(_._4).toSeq == Seq(None, Some(7.0), Some(7.0), Some(7.0)),
      "no observation yet → null, then LOCF")
  }
}
