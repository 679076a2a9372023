package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** E14/E15 BPE: the merge table must reproduce the hand-computed BPE run
  * on the classic word-frequency example, ties must break
  * lexicographically, greedy leftmost merging must handle overlapping
  * pairs, and the unfolded K-step plan must reuse — not recompute — the
  * repeated shuffle subtrees.
  */
class TokenizeSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private def corpus(rows: Seq[(Long, String)]): String = {
    import s.implicits._
    val docs = rows.map { case (id, text) =>
      (id, text, "en", "web", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("bpe").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("bpe_train reproduces the hand-computed merge sequence") {
    // hug×10 pug×5 pun×12 bun×4 hugs×5 (the standard BPE teaching corpus):
    //   (u,g)=20 → ug; (u,n)=16 → un; (h,ug)=15 → hug; (p,un)=12 → pun
    val d = corpus(Seq(
      1L -> Seq.fill(10)("hug").mkString(" "),
      2L -> Seq.fill(5)("pug").mkString(" "),
      3L -> Seq.fill(12)("pun").mkString(" "),
      4L -> Seq.fill(4)("bun").mkString(" "),
      5L -> Seq.fill(5)("hugs").mkString(" ")))
    val got = Tokenize.bpeTrain(s, d).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, "u", "g", 20L), (2, "u", "n", 16L),
      (3, "h", "ug", 15L), (4, "p", "un", 12L)), got.mkString("; "))
  }

  test("bpe_encode segments with the learned vocab") {
    // freqs incl. doc 5: hug=11 pug=6 pun=13 bun=5 hugs=1 → merges
    // (p,u,19)(pu,n,13)(h,u,12)(hu,g,12); vocab symbol counts:
    // hug=1, pug=[pu,g]=2, pun=1, bun=[b,u,n]=3, hugs=[hug,s]=2
    val d = corpus(Seq(
      1L -> Seq.fill(10)("hug").mkString(" "),
      2L -> Seq.fill(5)("pug").mkString(" "),
      3L -> Seq.fill(12)("pun").mkString(" "),
      4L -> Seq.fill(4)("bun").mkString(" "),
      5L -> "hug pug pun bun hugs"))
    val r = Tokenize.bpeEncode(s, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(r(5L) == ((5L, 16L, 9L)), r)   // 1+2+1+3+2
    assert(r(1L) == ((10L, 30L, 10L)), r) // hug fully merged
    assert(r(4L) == ((4L, 12L, 12L)), r)  // bun untouched by these merges
  }

  test("bpe_segment emits the positioned subword stream") {
    val d = corpus(Seq(
      1L -> Seq.fill(10)("hug").mkString(" "),
      2L -> Seq.fill(5)("pug").mkString(" "),
      3L -> Seq.fill(12)("pun").mkString(" "),
      4L -> Seq.fill(4)("bun").mkString(" "),
      5L -> "hug pug pun bun hugs"))
    // merges (p,u)(pu,n)(h,u)(hu,g) → hug=[hug] pug=[pu,g] pun=[pun]
    // bun=[b,u,n] hugs=[hug,s]
    val got = Tokenize.bpeSegment(s, d).collect()
      .filter(_.getLong(0) == 5L)
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (0L, 0L, "hug"), (1L, 0L, "pu"), (1L, 1L, "g"), (2L, 0L, "pun"),
      (3L, 0L, "b"), (3L, 1L, "u"), (3L, 2L, "n"),
      (4L, 0L, "hug"), (4L, 1L, "s")), got.mkString("; "))
  }

  test("pair-count ties break on (left, right) lexicographic order") {
    // (a,b) and (c,d) both count 3 → (a,b) must win step 1
    val d = corpus(Seq(1L -> "ab ab ab cd cd cd"))
    val first = Tokenize.bpeTrain(s, d).collect().head
    assert((first.getString(1), first.getString(2)) == (("a", "b")), first)
  }

  test("overlapping pairs merge greedy-leftmost: aaaa → (aa)(aa)") {
    val d = corpus(Seq(1L -> "aaaa aaaa aaaa"))
    // step 1 merges (a,a) with count 9 (3 adjacent pairs × 3 occurrences);
    // step 2 merges (aa,aa); steps 3-4 run DRY — the merge table stops at 2
    // rows and the vocab state must survive the empty steps (regression:
    // an empty argmax under a cross join zeroed the downstream vocab)
    val m = Tokenize.bpeTrain(s, d).collect()
    assert(m.length == 2, m.mkString("; "))
    assert((m.head.getString(1), m.head.getString(2), m.head.getLong(3)) ==
      (("a", "a", 9L)), m.mkString("; "))
    // after (a,a) then (aa,aa): each word is ONE symbol of 4 chars
    val e = Tokenize.bpeEncode(s, d).collect().head
    assert((e.getLong(1), e.getLong(2), e.getLong(3)) == ((3L, 12L, 3L)), e)
  }

  test("the unfolded K-step plan never re-derives a step: all leaves are checkpointed vocab state") {
    // Each step's vocab state is localCheckpoint'd (bounds the 2^K plan
    // blowup the old shared-subtree form paid at analysis time), so the
    // final train plan must read ONLY materialized vocab blocks — zero
    // corpus scans, zero recomputation of any earlier step.
    val df = Tokenize.bpeTrain(s, TestSpark.sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("FileScan"), p.take(4000))
    assert(p.contains("Scan ExistingRDD") || p.contains("LocalTableScan"), p.take(4000))
  }
}
