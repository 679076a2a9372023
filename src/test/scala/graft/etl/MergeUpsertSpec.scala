package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MergeUpsertSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("merge updates matched keys, inserts new, deletes tombstones") {
    import s.implicits._
    val snap = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "v", "x")
    val upd = Seq(
      (2L, "B", 25.0, false), // update
      (3L, "c", 30.0, true),  // delete
      (9L, "new", 1.0, false) // insert
    ).toDF("k", "v", "x", "__delete")
    val out = MergeUpsert.merge(snap, upd, "k")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, "a", 10.0), (2L, "B", 25.0), (9L, "new", 1.0)))
  }

  test("merge works when updates derive from the snapshot (self-lineage)") {
    import s.implicits._
    val snap = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val upd = snap.filter(col("k") === 2L)
      .select(col("k"), upper(col("v")).as("v"), lit(false).as("__delete"))
    val out = MergeUpsert.merge(snap, upd, "k")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "a"), (2L, "B")))
  }
}
