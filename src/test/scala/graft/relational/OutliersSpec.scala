package graft.relational

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OutliersSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("q_outliers flags exactly the >3-sigma value, per event type") {
    import s.implicits._
    // type A: 40 values at 10.0 ± small jitter plus one 500.0 spike → only
    // the spike exceeds 3σ. Type B: constant → zero variance, no outliers
    // (strict > keeps the degenerate group empty).
    val a = (0 until 40).map(i => (i.toLong, "2024-01-01 00:00:00", 1L, "A", 10.0 + (i % 5) * 0.1))
    val spike = Seq((99L, "2024-01-01 01:00:00", 1L, "A", 500.0))
    val b = (200 until 220).map(i => (i.toLong, "2024-01-01 02:00:00", 2L, "B", 7.0))
    val ev = (a ++ spike ++ b).toDF("event_id", "tss", "user_id", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("tss")).as("ts"), col("user_id"),
        col("event_type"), col("value"), lit("{}").as("props"))
    val tmp = java.nio.file.Files.createTempDirectory("outl").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Relational.qOutliers(s, tmp).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((99L, "A")))
  }
}
