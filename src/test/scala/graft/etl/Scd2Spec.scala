package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** A22 `scd2_history`: the type-2 build must collapse consecutive
  * duplicates into one version, chain the validity intervals exactly,
  * flag only the last version current — and do all of it in ONE
  * exchange (every window layer and the aggregate reuse the user_id
  * partitioning).
  */
class Scd2Spec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("crafted change log: dup collapse, interval chaining, current flag") {
    import s.implicits._
    // user 1: a a b a  → versions a[10,30) b[30,40) a[40,∞)
    // user 2: x        → single current version
    val events = Seq(
      (1L, 1L, "a", 10L), (2L, 1L, "a", 20L), (3L, 1L, "b", 30L), (4L, 1L, "a", 40L),
      (5L, 2L, "x", 50L)
    ).map { case (eid, uid, et, sec) => (eid, uid, et, sec * 1000000L, 0.0, "{}") }
      .toDF("event_id", "user_id", "event_type", "us", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(us)"))
      .drop("us")
    val tmp = java.nio.file.Files.createTempDirectory("scd2").toString
    events.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Scd.scd2History(s, tmp).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      (1L, 1L, "a", 10L, 30L, false, 2L), // two 'a' rows collapsed
      (1L, 2L, "b", 30L, 40L, false, 1L),
      (1L, 3L, "a", 40L, -1L, true, 1L),  // 'a' again = NEW version, current
      (2L, 1L, "x", 50L, -1L, true, 1L)))
  }

  test("the whole build is one exchange: windows and aggregate share the key partitioning") {
    val p = Scd.scd2History(s, TestSpark.sf).queryExecution.executedPlan.toString
    val exchanges = p.split("\n").count(l =>
      l.contains("Exchange") && !l.contains("rangepartitioning"))
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges\n$p")
  }
}
