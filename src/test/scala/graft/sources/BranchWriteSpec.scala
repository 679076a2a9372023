package graft.sources

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import graft.etl.Snapshots
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Branch-write edge contracts beyond the oracled `catalog_wap`: the
  * refusals (no branch, tag target, layout-carrying table) and the
  * branch-overwrite shape (replace the branch head, main untouched).
  */
class BranchWriteSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private var n = 0
  private def freshCatalog(): (String, Path) = {
    n += 1
    val cat = s"gbw$n"
    val root = Files.createTempDirectory(s"graft_gbw$n")
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, root)
  }

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  test("branch must exist; tags refuse; layouts refuse") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL)")
      s.range(0, 100).select(col("id").as("k")).writeTo(s"$cat.t").append()
      val noBranch = intercept[Exception] {
        s.range(100, 200).select(col("id").as("k"))
          .writeTo(s"$cat.t").option("branch", "nope").append()
      }
      assert(noBranch.getMessage.contains("no branch"),
        s"wrong refusal: ${noBranch.getMessage}")
      s.sql(s"CALL $cat.system.create_tag('t', 'v1', 1)")
      val tag = intercept[Exception] {
        s.range(100, 200).select(col("id").as("k"))
          .writeTo(s"$cat.t").option("branch", "v1").append()
      }
      assert(tag.getMessage.contains("immutable"), s"wrong refusal: ${tag.getMessage}")
      s.sql(s"CREATE TABLE $cat.p (pk BIGINT, v BIGINT) PARTITIONED BY (pk)")
      s.range(0, 10).select((col("id") % 2).as("pk"), col("id").as("v"))
        .writeTo(s"$cat.p").append()
      val layout = intercept[Exception] {
        s.range(0, 10).select((col("id") % 2).as("pk"), col("id").as("v"))
          .writeTo(s"$cat.p").option("branch", "x").append()
      }
      assert(layout.getMessage.contains("plain tables"),
        s"wrong refusal: ${layout.getMessage}")
    } finally rm(root)
  }

  test("branch overwrite replaces the branch head; main untouched") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL)")
      s.range(0, 100).select(col("id").as("k")).writeTo(s"$cat.t").append()
      val store = root.resolve("t")
      s.sql(s"CALL $cat.system.create_branch('t', 'b', " +
        s"${Snapshots.currentId(store).get})")
      s.range(100, 150).select(col("id").as("k"))
        .writeTo(s"$cat.t").option("branch", "b").append()
      assert(s.sql(s"SELECT count(*) c FROM $cat.t VERSION AS OF 'b'")
        .head().getLong(0) == 150L)
      // overwrite: the branch head becomes ONLY the new rows
      s.range(500, 520).select(col("id").as("k"))
        .writeTo(s"$cat.t").option("branch", "b").overwrite(lit(true))
      assert(s.sql(s"SELECT count(*) c FROM $cat.t VERSION AS OF 'b'")
        .head().getLong(0) == 20L)
      assert(s.table(s"$cat.t").count() == 100L, "main line moved")
      // adoption makes the overwritten head live
      s.sql(s"CALL $cat.system.adopt_branch('t', 'b')")
      assert(s.table(s"$cat.t").count() == 20L)
    } finally rm(root)
  }
}
