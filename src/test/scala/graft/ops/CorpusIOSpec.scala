package graft.ops

import graft.{Tables, TestSpark}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

class CorpusIOSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("JSONL round-trip preserves the documents table") {
    val docs = Tables.documents(s, TestSpark.sf)
    val dir = Files.createTempDirectory("jsonl").toString + "/docs"
    CorpusIO.writeJsonl(docs, dir)
    val back = CorpusIO.readJsonlClean(s, dir)
    assert(back.count() == docs.count())
    val a = docs.orderBy("doc_id").collect().map(_.getString(1))
    val b = back.orderBy("doc_id").collect().map(_.getString(1))
    assert(a.sameElements(b))
  }

  test("CSV round-trip survives embedded quotes, commas and newlines") {
    import s.implicits._
    val nasty = Seq(
      (1L, "plain text", "en", "web", 10L),
      (2L, "comma, inside", "en", "web", 13L),
      (3L, "a \"quoted\" span", "en", "web", 15L),
      (4L, "line one\nline two", "en", "web", 17L),
      (5L, "all, of \"it\"\nat once, \"really\"", "en", "web", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("csvnasty").toString + "/documents.parquet"
    nasty.write.mode("overwrite").parquet(dir)
    val out = CorpusIO.formatsQuery(s, dir.stripSuffix("/documents.parquet"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("csv", 5L, 0L), ("orc", 5L, 0L)), out.toString)
  }

  test("malformed JSONL lines are quarantined, not fatal") {
    import s.implicits._
    val dir = Files.createTempDirectory("badjsonl").toString + "/docs"
    Seq(
      """{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}""",
      """this is not json""",
      """{"doc_id": 3, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}""")
      .toDF("value").write.mode("overwrite").text(dir)
    val all = CorpusIO.readJsonl(s, dir)
    assert(all.filter($"_corrupt_record".isNotNull).count() == 1)
    val clean = CorpusIO.readJsonlClean(s, dir)
    assert(clean.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("text-per-line ingest assigns content-stable ids") {
    import s.implicits._
    val dir = Files.createTempDirectory("txt").toString + "/docs"
    Seq("alpha beta", "", "gamma delta").toDF("value").write.mode("overwrite").text(dir)
    val docs = CorpusIO.readTextLines(s, dir).collect()
    assert(docs.length == 2) // empty line dropped
    val again = CorpusIO.readTextLines(s, dir).collect()
    assert(docs.map(_.getLong(0)).toSet == again.map(_.getLong(0)).toSet)
  }
}
