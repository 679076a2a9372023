package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** A23 byte-offset sharding semantics on a crafted listing:
  * target = 100, files (seq → bytes):
  *   0→60, 1→60 (straddles the 100 boundary → still group 1 by its START
  *   offset), 2→30, 3→250 (oversize: spans groups → its successors jump),
  *   4→10.
  * Offsets: 0,60,120,150,400 → groups 0,0,1,1,4.
  */
class CompactionSpec extends AnyFunSuite {

  test("groups bin by start offset; oversize files flag and advance the group id") {
    val s = TestSpark.spark
    val sq = s; import sq.implicits._
    val listing = Seq(
      ("web", 0L, 60L, 1L), ("web", 1L, 60L, 1L), ("web", 2L, 30L, 1L),
      ("web", 3L, 250L, 1L), ("web", 4L, 10L, 1L),
      ("book", 0L, 10L, 1L))
      .toDF("source", "file_seq", "bytes", "n_docs")
    val out = Compaction.planOn(listing, 100L).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    // web group 0: files 0+1 (straddler stays with its start), 120 bytes
    assert(out(("web", 0L)) == ((2L, 120L, 0L, 1L, 0L)))
    // web group 1: file 2 then the oversize file 3 starting at offset 150
    assert(out(("web", 1L)) == ((2L, 280L, 2L, 3L, 1L)))
    // file 4 starts at offset 400 → group 4; ids 2,3 are legitimately absent
    assert(out(("web", 4L)) == ((1L, 10L, 4L, 4L, 0L)))
    assert(!out.contains(("web", 2L)) && !out.contains(("web", 3L)))
    // sources plan independently
    assert(out(("book", 0L)) == ((1L, 10L, 0L, 0L, 0L)))
  }

  test("every input byte lands in exactly one group") {
    val s = TestSpark.spark
    val listing = Compaction.fileListing(s, TestSpark.sf)
    val plan = Compaction.planOn(listing, Compaction.TargetBytes)
    val inBytes = listing.agg(org.apache.spark.sql.functions.sum("bytes"))
      .collect()(0).getLong(0)
    val outBytes = plan.agg(org.apache.spark.sql.functions.sum("grp_bytes"))
      .collect()(0).getLong(0)
    assert(inBytes == outBytes && inBytes > 0)
  }
}
