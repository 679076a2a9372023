package graft.ops
// (repetition spec appended r5)

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("fingerprint is stable, and local edits keep most of the signature") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val fp1 = TextKernelImpl.fingerprint(text)
    val fp2 = TextKernelImpl.fingerprint(text)
    assert(fp1 == fp2)
    val edited = text.replace("lazy", "hazy")
    val shared = fp1.split(":").toSet.intersect(
      TextKernelImpl.fingerprint(edited).split(":").toSet)
    assert(shared.nonEmpty, "an 8-char-window min-sketch should survive a 1-word edit")
    assert(TextKernelImpl.fingerprint("short") != TextKernelImpl.fingerprint("shor"))
  }

  test("langId picks the language with most stopword hits") {
    import s.implicits._
    val docs = Seq(
      (0L, "the cat and the dog of a house", "en", "x", 1L),
      (1L, "el gato y la casa de el perro", "es", "x", 1L),
      (2L, "zzz qqq www", "zz", "x", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("lang").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.langId(s, tmp).collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(out(0L) == "en")
    assert(out(1L) == "es")
    assert(out(2L) == "und")
  }

  test("piiRedact scrubs planted emails/IPs/phones and leaves clean docs alone") {
    import s.implicits._
    val docs = Seq((0L, "plain words only"), (1L, "untouched text"),
      (3L, "more plain words")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("pii").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.piiRedact(s, tmp).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    // doc 0 and 3 (doc_id % 3 == 0) get the planted contact line, doc 1 stays clean
    assert(out(0L) == ((1, 1, 1, "plain words only contact [EMAIL] or [IP] tel [PHONE]")))
    assert(out(3L)._4 == "more plain words contact [EMAIL] or [IP] tel [PHONE]")
    assert(out(1L) == ((0, 0, 0, "untouched text")))
  }

  test("repetition score is exact on hand-computed duplicated n-grams") {
    import graft.TestSpark.spark.implicits._
    val s = graft.TestSpark.spark
    // "a b a b a": 2-grams [a b, b a, a b, b a] → 2 dups of 4 → 500;
    // 3-grams [a b a, b a b, a b a] → 1 dup of 3 → 333; 4-grams
    // [a b a b, b a b a] → 0
    val docs = Seq((0L, "a b a b a"), (1L, "x y"), (2L, "w w w w w w"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("rep").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.repetitionScore(s, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == ((500L, 333L, 0L)), out.toString)
    assert(out(1L) == ((0L, 0L, 0L)), out.toString)     // too short for any n
    assert(out(2L) == ((800L, 750L, 666L)), out.toString) // all-identical grams
  }

  test("simhash64 kernel matches a reference bit-vote computation") {
    val text = "a b a"
    val ha = TextKernelImpl.fnv1a64("a")
    val hb = TextKernelImpl.fnv1a64("b")
    var expected = 0L
    (0 until 64).foreach { b =>
      val v = 2 * (((ha >>> b) & 1) * 2 - 1) + (((hb >>> b) & 1) * 2 - 1)
      if (v > 0) expected |= (1L << b)
    }
    assert(TextKernelImpl.simhash64(text) == expected)
  }
}
