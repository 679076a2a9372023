package graft.sources

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import graft.etl.Snapshots
import org.scalatest.funsuite.AnyFunSuite

/** `CALL system.add_files` (adopt external parquet with zero bytes
  * rewritten) and `CALL system.remove_orphans` (reclaim crash-leftover
  * stagings no manifest references), r14.
  */
class AdoptOrphanSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  import s.implicits._

  private def tmp(tag: String): Path = Files.createTempDirectory(s"graft_ao_$tag")

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  private def parquetsUnder(dir: Path): Seq[Path] = {
    if (!Files.exists(dir)) return Nil
    val walk = Files.walk(dir)
    try walk.iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".parquet"))
    finally walk.close()
  }

  test("adoptFiles: bytes move verbatim, zone maps land, tombstones unaffected") {
    val root = tmp("adopt")
    val ext = tmp("adoptsrc")
    try {
      Snapshots.publish(s, root,
        (1L to 50L).map(i => (i, s"v$i")).toDF("k", "v"))
      Snapshots.publishDeletes(s, root, Seq(10L, 11L).toDF("k"))
      (100L to 120L).map(i => (i, s"x$i")).toDF("k", "v")
        .repartition(2).write.mode("overwrite").parquet(ext.toString)
      val extMd5 = parquetsUnder(ext)
        .map(p => p.getFileName.toString -> Snapshots.md5hex(p)).toMap
      val (nf, _, id) = Snapshots.adoptFiles(s, root, ext, statsCol = Some("k"))
      assert(nf == extMd5.size)
      val adopted = Snapshots.manifest(root, id).filter(_.relPath.contains("adopt-"))
      assert(adopted.size == nf)
      adopted.foreach { e =>
        val name = java.nio.file.Paths.get(e.relPath).getFileName.toString
        assert(extMd5.get(name).contains(e.md5), s"$name rewritten during adoption")
        assert(e.stats.nonEmpty, s"$name missing its zone map")
      }
      // source dir is drained (moved, not copied)
      assert(parquetsUnder(ext).isEmpty)
      // merged read: prior tombstones still apply to OLD files only;
      // adopted rows all visible
      val st = Snapshots.readCurrent(s, root).as[(Long, String)].collect().toMap
      assert(st.size == 48 + 21 && !st.contains(10L) && st(100L) == "x100")
    } finally { rm(ext); rm(root) }
  }

  test("adoptFiles refuses nested (partitioned) sources") {
    val root = tmp("adoptnest")
    val ext = tmp("adoptnestsrc")
    try {
      Snapshots.publish(s, root, Seq((1L, "a")).toDF("k", "v"))
      Seq((2L, "b")).toDF("k", "v").write.mode("overwrite")
        .parquet(ext.resolve("sub").toString)
      val e = intercept[IllegalArgumentException] {
        Snapshots.adoptFiles(s, root, ext)
      }
      assert(e.getMessage.contains("FLAT") || e.getMessage.contains("no parquet"))
    } finally { rm(ext); rm(root) }
  }

  test("removeOrphans reclaims crashed stagings, never referenced files") {
    val root = tmp("orphan")
    try {
      Snapshots.publish(s, root, (1L to 30L).map(i => (i, i * 2)).toDF("k", "v"))
      // a crashed OCC write: data staged, no manifest ever written
      val crashedData = Snapshots.stageOcc(s, root,
        (31L to 40L).map(i => (i, i * 2)).toDF("k", "v"))
      // a crashed tombstone staging too
      val crashedTomb = Snapshots.stageTombstoneOcc(s, root, Seq(1L).toDF("k"))
      assert(crashedData.nonEmpty && crashedTomb.nonEmpty)
      val before = parquetsUnder(root).size
      // a cutoff in the past protects in-flight writers: nothing goes
      assert(Snapshots.removeOrphans(root,
        System.currentTimeMillis() - 3600000L) == ((0, 0L)))
      assert(parquetsUnder(root).size == before)
      // a future cutoff reclaims exactly the unreferenced stagings
      val (n, bytes) = Snapshots.removeOrphans(root,
        System.currentTimeMillis() + 3600000L)
      assert(n == crashedData.size + crashedTomb.size && bytes > 0L)
      // referenced data intact, staging dirs swept clean
      assert(Snapshots.readCurrent(s, root).count() == 30)
      assert(parquetsUnder(root).size == before - n)
      assert(!parquetsUnder(root).exists(_.toString.contains("occ-")))
      // idempotent
      assert(Snapshots.removeOrphans(root,
        System.currentTimeMillis() + 3600000L) == ((0, 0L)))
    } finally rm(root)
  }

  test("remove_orphans and add_files from SQL CALL") {
    val root = tmp("callroot")
    val ext = tmp("callsrc")
    try {
      val cat = "gao" + System.nanoTime().toString.takeRight(8)
      s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
      s.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT)")
      s.sql(s"INSERT INTO $cat.t SELECT id, id * 2 FROM range(0, 10)")
      s.range(10, 20).selectExpr("id AS k", "id * 2 AS v")
        .coalesce(1).write.mode("overwrite").parquet(ext.toString)
      val added = s.sql(s"CALL $cat.system.add_files(tbl => 't', " +
        s"src => '${ext.toString}')").head
      assert(added.getInt(0) == 1)
      assert(s.sql(s"SELECT count(*) FROM $cat.t").head.getLong(0) == 20)
      // orphan a staging, then sweep it through SQL
      Snapshots.stageOcc(s, root.resolve("t"),
        s.range(0, 5).selectExpr("id AS k", "id AS v"))
      val swept = s.sql(s"CALL $cat.system.remove_orphans(tbl => 't', " +
        s"older_than_ms => ${System.currentTimeMillis() + 3600000L}L)").head
      assert(swept.getInt(0) >= 1)
      assert(s.sql(s"SELECT count(*) FROM $cat.t").head.getLong(0) == 20)
    } finally { rm(ext); rm(root) }
  }
}
