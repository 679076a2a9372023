package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SearchSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("bm25 ranks a rare-term-heavy doc above a common-term doc") {
    import s.implicits._
    // "query"/"window" occur in every doc (idf floor); "dup" only in d0/d2.
    // d0: rare term 3× in a short doc → top. d1: only the common terms,
    // high tf → middle. d2: one rare hit diluted by an 80-token tail —
    // length normalization holds it below the short common-term doc.
    val pad = (0 until 80).map(i => s"filler$i").mkString(" ")
    val docs = Seq(
      (0L, "dup dup dup query window"),
      (1L, "query window query window query"),
      (2L, s"dup query window $pad")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("bm25").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Search.bm25(s, tmp).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L))
    // scores strictly decreasing in this construction
    assert(out.map(_._3).toSeq == out.map(_._3).sorted(Ordering[Long].reverse).toSeq)
  }

  test("bm25 plan ends in TakeOrderedAndProject (per-partition top-k, no global sort)") {
    val plan = Search.bm25(s, TestSpark.sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("inverted index caps posting prefix but keeps full df/cf counts") {
    import s.implicits._
    // 150 docs all containing "hot"; doc 7 also has "cold" twice
    val docs = (0 until 150).map(i =>
      (i.toLong, if (i == 7) "hot cold cold" else "hot")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("idx").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Search.invertedIndex(s, tmp).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val hot = out("hot")
    assert(hot._1 == 150L && hot._2 == 150L, "df/cf count ALL postings")
    assert(hot._3.split(",").length == Search.PostingCap, "prefix capped")
    assert(hot._3.split(",").head == "0" && hot._3.split(",").last == "99",
      "prefix is the docid-ordered head, not an arbitrary subset")
    val cold = out("cold")
    assert(cold._1 == 1L && cold._2 == 2L && cold._3 == "7")
  }

  test("bm25 returns at most K rows, scores non-increasing, n_terms bounded") {
    val rows = Search.bm25(s, TestSpark.sf).collect()
    assert(rows.length <= Search.TopK && rows.nonEmpty)
    val scores = rows.map(_.getLong(2)).toSeq
    assert(scores == scores.sorted(Ordering[Long].reverse))
    assert(rows.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= Search.QueryTerms.size))
  }
}
