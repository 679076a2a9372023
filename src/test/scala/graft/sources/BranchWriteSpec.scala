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

  test("branch must exist; tags, morkey and dynamic overwrite refuse") {
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
      s.sql(s"CREATE TABLE $cat.m (k BIGINT NOT NULL, v BIGINT NOT NULL) " +
        "TBLPROPERTIES ('morkey'='k')")
      s.range(0, 10).select(col("id").as("k"), col("id").as("v"))
        .writeTo(s"$cat.m").append()
      val mor = intercept[Exception] {
        s.range(10, 20).select(col("id").as("k"), col("id").as("v"))
          .writeTo(s"$cat.m").option("branch", "x").append()
      }
      assert(mor.getMessage.contains("morkey"), s"wrong refusal: ${mor.getMessage}")
      s.sql(s"CREATE TABLE $cat.p (pk BIGINT, v BIGINT) PARTITIONED BY (pk)")
      s.range(0, 10).select((col("id") % 2).as("pk"), col("id").as("v"))
        .writeTo(s"$cat.p").append()
      s.sql(s"CALL $cat.system.create_branch('p', 'b', " +
        s"${Snapshots.currentId(root.resolve("p")).get})")
      val dyn = intercept[Exception] {
        s.range(0, 10).select((col("id") % 2).as("pk"), col("id").as("v"))
          .writeTo(s"$cat.p").option("branch", "b").overwritePartitions()
      }
      assert(dyn.getMessage.contains("no branch face"),
        s"wrong refusal: ${dyn.getMessage}")
    } finally rm(root)
  }

  test("partitioned and bucketed branch writes stage layout-pure; claims survive adoption") {
    val (cat, root) = freshCatalog()
    try {
      // identity-partitioned: the branch write lands value-pure _pv= files
      s.sql(s"CREATE TABLE $cat.p (pk BIGINT, v BIGINT) PARTITIONED BY (pk)")
      s.range(0, 4000).select((col("id") % 4).as("pk"), col("id").as("v"))
        .writeTo(s"$cat.p").append()
      val pStore = root.resolve("p")
      s.sql(s"CALL $cat.system.create_branch('p', 'b', " +
        s"${Snapshots.currentId(pStore).get})")
      s.range(4000, 6000).select((col("id") % 4 + 4).as("pk"), col("id").as("v"))
        .writeTo(s"$cat.p").option("branch", "b").append()
      assert(s.table(s"$cat.p").count() == 4000L, "main moved")
      assert(s.sql(s"SELECT count(*) c FROM $cat.p VERSION AS OF 'b'")
        .head().getLong(0) == 6000L)
      // the staged branch files are value-pure (every new path carries _pv=)
      val bId = Snapshots.refId(pStore, "b").get
      val mainSet = Snapshots.manifest(pStore,
        Snapshots.currentId(pStore).get).map(_.relPath).toSet
      val staged = Snapshots.manifest(pStore, bId).filterNot(e => mainSet(e.relPath))
      assert(staged.nonEmpty && staged.forall(_.relPath.contains("_pv=")),
        s"branch staging not value-pure: ${staged.map(_.relPath)}")
      s.sql(s"CALL $cat.system.adopt_branch('p', 'b')")
      // partition-pruned reads work on the adopted branch rows
      assert(s.table(s"$cat.p").filter(col("pk") === 5).count() == 500L)

      // bucketed: branch write rolls bucket-pure through the clustered writer
      s.sql(s"CREATE TABLE $cat.bkt (k BIGINT NOT NULL, v BIGINT NOT NULL) " +
        "PARTITIONED BY (bucket(4, k))")
      s.range(0, 1000).select(col("id").as("k"), col("id").as("v"))
        .writeTo(s"$cat.bkt").append()
      val bStore = root.resolve("bkt")
      s.sql(s"CALL $cat.system.create_branch('bkt', 'b', " +
        s"${Snapshots.currentId(bStore).get})")
      s.range(1000, 1500).select(col("id").as("k"), col("id").as("v"))
        .writeTo(s"$cat.bkt").option("branch", "b").append()
      assert(s.table(s"$cat.bkt").count() == 1000L, "main moved")
      s.sql(s"CALL $cat.system.adopt_branch('bkt', 'b')")
      assert(s.table(s"$cat.bkt").count() == 1500L)
      val all = Snapshots.manifest(bStore, Snapshots.currentId(bStore).get)
      assert(all.forall(_.relPath.contains("_pv=")),
        s"bucket staging not bucket-pure: ${all.map(_.relPath)}")
    } finally rm(root)
  }

  test("streaming writes refuse the branch option at stream start") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL)")
      s.range(0, 10).select(col("id").as("k")).writeTo(s"$cat.t").append()
      val src = Files.createTempDirectory("gbw_src")
      s.range(0, 10).select(col("id").as("k"))
        .write.mode("overwrite").parquet(src.toString)
      val ckpt = Files.createTempDirectory("gbw_ckpt")
      val e = intercept[Exception] {
        val q = s.readStream.schema("k BIGINT").parquet(src.toString)
          .writeStream.option("checkpointLocation", ckpt.toString)
          .option("branch", "x")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .toTable(s"$cat.t")
        try q.awaitTermination(30000) finally if (q.isActive) q.stop()
      }
      assert(e.getMessage != null && (e.getMessage.contains("no streaming face") ||
        Option(e.getCause).exists(_.getMessage.contains("no streaming face"))),
        s"wrong refusal: ${e.getMessage} / ${Option(e.getCause).map(_.getMessage)}")
      rm(src); rm(ckpt)
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
