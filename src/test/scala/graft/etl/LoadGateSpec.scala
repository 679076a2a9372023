package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins the LoadFiles.pm:56-64 gate: clean first load succeeds, a
  * first-attempt collision throws, a retry drops and reloads to exactly
  * the fresh-load state.
  */
class LoadGateSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("first load succeeds, collision throws, retry drops and reloads") {
    import s.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val path = java.nio.file.Files.createTempDirectory("gate").toString + "/db"
    LoadGate.load(df, path, retryCount = 0) // fresh target: first attempt OK
    assert(s.read.parquet(path).count() == 3)

    val ex = intercept[IllegalStateException] {
      LoadGate.load(df, path, retryCount = 0)
    }
    assert(ex.getMessage.contains("already exists"), ex.getMessage)

    // retry against a DIFFERENT (stale) resident: drop-and-reload wins
    val stale = Seq((9L, "stale")).toDF("k", "v")
    LoadGate.load(stale, path, retryCount = 1)
    LoadGate.load(df, path, retryCount = 2)
    val rows = s.read.parquet(path).orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }
}
