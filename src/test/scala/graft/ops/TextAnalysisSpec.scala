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

  test("gopherFilter rules fire on the right documents") {
    import s.implicits._
    val good = ("the " + Seq.fill(48)("word").mkString(" ") + " of") // 50 toks, 2 stopwords
    val short = "the quick fox of it"                    // fails word count
    val longWords = ("the " + Seq.fill(48)("supercalifragilistic").mkString(" ") + " of")
    val docs = Seq((0L, good), (1L, short), (2L, longWords)).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("gopher").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.gopherFilter(s, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Boolean]("keep"), "good doc must pass all rules")
    assert(!out(1L).getAs[Boolean]("r_word_count") && !out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("r_mean_len"), "20-char words fail mean length")
    assert(out(0L).getAs[Long]("n_stop") == 2L)
  }

  test("unigramSurprisal computes exact floor-log2 bits per token") {
    import s.implicits._
    // corpus: a×4, b×2, c×1, d×1 → N=8 (floor_log2=3)
    // bits: a → 3-2=1, b → 3-1=2, c/d → 3-0=3
    val docs = Seq((0L, "a a a a"), (1L, "b b c d")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("unigram").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.unigramSurprisal(s, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == ((4L, 4L, 1000L)), out.toString)   // 4 tokens × 1 bit
    assert(out(1L) == ((4L, 10L, 2500L)), out.toString)  // 2+2+3+3 = 10 bits
  }

  test("bigramSurprisal computes exact conditional floor-log2 bits per transition") {
    import s.implicits._
    // pairs: doc0 → (a,"a b")×2, (b,"b a"); doc1 → (a,"a b"), (b,"b c")
    // counts: cp("a b")=3 cp("b a")=1 cp("b c")=1; cw(a)=3 cw(b)=2
    // bits:  "a b" → fl2(3)-fl2(3)=0; "b a"/"b c" → fl2(2)-fl2(1)=1
    val docs = Seq((0L, "a b a b"), (1L, "a b c"), (2L, "x"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("bigram").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.bigramSurprisal(s, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == ((3L, 1L, 333L)), out.toString)
    assert(out(1L) == ((2L, 1L, 500L)), out.toString)
    assert(!out.contains(2L), "single-token docs have no transitions")
  }

  test("dsirWeights matches an exact replay and ranks target-like text above off-target") {
    import s.implicits._
    val rows = Seq((0L, "a b a b", "en"), (1L, "x y x y", "fr"), (2L, "a b", "fr"))
    val docs = rows.toDF("doc_id", "text", "lang")
    val tmp = java.nio.file.Files.createTempDirectory("dsir").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // replay: bucket = fnv1a64(bigram) & 1023; dist over all occurrences,
    // target slice = en; bits = (fl2(ct+1)-fl2(nt+1024)) - (fl2(cr+1)-fl2(nr+1024))
    def fl2(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    val occs = rows.flatMap { case (id, text, lang) =>
      val w = text.split(" ")
      w.indices.dropRight(1).map(i =>
        (id, lang, TextKernelImpl.fnv1a64(w(i) + " " + w(i + 1)) & 1023L))
    }
    val cr = occs.groupBy(_._3).map { case (b, o) => b -> o.size.toLong }
    val ct = occs.filter(_._2 == "en").groupBy(_._3)
      .map { case (b, o) => b -> o.size.toLong }.withDefaultValue(0L)
    val (nr, nt) = (occs.size.toLong, occs.count(_._2 == "en").toLong)
    val want = occs.groupBy(o => (o._1, o._2)).map { case ((id, lang), o) =>
      val bits = o.map(x => (fl2(ct(x._3) + 1) - fl2(nt + 1024)) -
        (fl2(cr(x._3) + 1) - fl2(nr + 1024))).sum
      id -> ((lang, o.size.toLong, bits, bits > 0))
    }
    val got = TextAnalysis.dsirWeights(s, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(got == want, s"got $got want $want")
    assert(got(0L)._3 > got(1L)._3, "pure-target doc outscores pure-off-target doc")
  }

  test("ngramLm counts trigrams with doc frequency and prunes below 3") {
    import s.implicits._
    // doc0 trigrams: "a b c"×2, "b c a", "c a b"; doc1: "a b c", "b c x"
    // → only "a b c" survives n>=3 (n=3, df=2)
    val docs = Seq((0L, "a b c a b c"), (1L, "a b c x"), (2L, "y z"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("nglm").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.ngramLm(s, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a b c", 3L, 2L)), out.mkString(","))
  }

  test("docChunk slides 32-token windows on a 24 stride, truncating the tail") {
    import s.implicits._
    val w57 = (1 to 57).map(i => s"w$i")
    val docs = Seq((0L, w57.mkString(" ")), (1L, "a b c")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("chunk").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.docChunk(s, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out.keys.count(_._1 == 0L) == 3, "57 tokens → chunks at 0/24/48")
    assert(out((0L, 0L)) == ((0L, 32L, TextKernelImpl.fnv1a64(w57.slice(0, 32).mkString(" ")))))
    assert(out((0L, 1L)) == ((24L, 32L, TextKernelImpl.fnv1a64(w57.slice(24, 56).mkString(" ")))))
    assert(out((0L, 2L)) == ((48L, 9L, TextKernelImpl.fnv1a64(w57.slice(48, 57).mkString(" ")))))
    assert(out((1L, 0L)) == ((0L, 3L, TextKernelImpl.fnv1a64("a b c"))), "short doc = one chunk")
  }

  test("classifier logit sums hashed-bucket weights; query agrees with the kernel") {
    import s.implicits._
    def w(tok: String): Long = {
      val b = TextKernelImpl.fnv1a64(tok) & 63L
      (b * 2654435761L) % 4294967296L % 17L - 8L
    }
    assert(TextKernelImpl.classifierLogit("a b a") == 2 * w("a") + w("b"))
    assert(TextKernelImpl.classifierLogit("  a   b  ") == w("a") + w("b"),
      "runs of spaces yield no empty-token features")
    val docs = Seq((0L, "a b a"), (1L, "spark join")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("clf").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.classifierScore(s, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(0L)._1 == 2 * w("a") + w("b"))
    assert(out(1L)._1 == w("spark") + w("join"))
    assert(out.forall { case (_, (l, k)) => k == (l > 0) })
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
