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

  test("A22b deletes: tombstone closes without successor, later change re-creates") {
    import s.implicits._
    // event_id % 41 == 0 is the tombstone rule (ids 41, 82 below).
    // user 1: a@10  DEL@20  b@30   → a[10,20) closed by delete; b[30,∞) re-created
    // user 2: x@50  DEL@60         → x[50,60); NO current row for user 2
    // user 3: y@70  DEL@80 DEL@81  → consecutive tombstones collapse; y[70,80)
    val events = Seq(
      (1L, 1L, "a", 10L), (41L, 1L, "zz", 20L), (3L, 1L, "b", 30L),
      (5L, 2L, "x", 50L), (82L, 2L, "zz", 60L),
      (7L, 3L, "y", 70L), (123L, 3L, "zz", 80L), (164L, 3L, "zz", 81L)
    ).map { case (eid, uid, et, sec) => (eid, uid, et, sec * 1000000L, 0.0, "{}") }
      .toDF("event_id", "user_id", "event_type", "us", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(us)"))
      .drop("us")
    val tmp = java.nio.file.Files.createTempDirectory("scd2d").toString
    events.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Scd.scd2Deletes(s, tmp).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      (1L, 1L, "a", 10L, 20L, false, 1L), // closed by the tombstone, not by b
      (1L, 2L, "b", 30L, -1L, true, 1L),  // re-created after the delete
      (2L, 1L, "x", 50L, 60L, false, 1L), // user 2 ends deleted: no current row
      (3L, 1L, "y", 70L, 80L, false, 1L)  // both tombstones collapsed into one close
    ), out.toSeq.toString)
  }

  test("A22b keeps A22's one-exchange plan shape") {
    val p = Scd.scd2Deletes(s, TestSpark.sf).queryExecution.executedPlan.toString
    val exchanges = p.split("\n").count(l =>
      l.contains("Exchange") && !l.contains("rangepartitioning"))
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges\n$p")
  }
}
