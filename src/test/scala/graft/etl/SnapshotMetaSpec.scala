package graft.etl

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The introspection relations (`.snapshots` / `.files` / refs) beyond
  * what the oracled `snapshot_meta` pins: exact `.files` fidelity
  * against the manifest including zone-map surfacing, ref listing, and
  * degenerate-store behavior.
  */
class SnapshotMetaSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private def tmpRoot(): Path = Files.createTempDirectory("graft_metaspec")

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  private def block(tag: Int, rows: Int = 100) = {
    val sq = s; import sq.implicits._
    (0 until rows).map(i => (tag.toLong, i.toLong)).toDF("tag", "i")
  }

  test(".files mirrors the manifest exactly, zone maps included") {
    val sq = s; import sq.implicits._
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root,
        (0L until 100L).map(i => (i, i % 7)).toDF("k", "v")
          .repartitionByRange(2, org.apache.spark.sql.functions.col("k")),
        statsCol = Some("k"))
      Snapshots.publishDeletes(s, root, Seq(3L, 5L).toDF("k"))
      val n = Snapshots.currentId(root).get
      val expect = Snapshots.manifest(root, n)
      val got = Snapshots.metaFiles(s, root, n).collect()
      assert(got.length == expect.length)
      val byPath = got.map(r => r.getString(0) -> r).toMap
      expect.foreach { e =>
        val r = byPath(e.relPath)
        assert(r.getString(1) == (if (e.relPath.startsWith("deletes/")) "delete" else "data"))
        assert(r.getLong(2) == e.seq && r.getLong(3) == e.bytes && r.getString(4) == e.md5)
        assert(Option(r.get(5)).map(_.asInstanceOf[Long]) == e.stats.map(_._1))
        assert(Option(r.get(6)).map(_.asInstanceOf[Long]) == e.stats.map(_._2))
      }
      // named zone maps surface in n_named_stats after a z-order rewrite
      val (zid, _) = Snapshots.compactZOrder(s, root, 2, "k", "v")
      val zRows = Snapshots.metaFiles(s, root, zid).collect()
      assert(zRows.forall(_.getLong(7) == 2L), "z-order entries must carry 2 named stats")
    } finally rm(root)
  }

  test("refs relation lists branches and tags; empty store relations are empty") {
    val root = tmpRoot()
    try {
      assert(Snapshots.metaSnapshots(s, root).count() == 0)
      assert(Snapshots.metaRefs(s, root).count() == 0)
      Snapshots.publish(s, root, block(1))
      Snapshots.publish(s, root, block(2), append = true)
      Snapshots.createBranch(root, "dev", 1)
      Snapshots.createTag(root, "v1", 2)
      val refs = Snapshots.metaRefs(s, root).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(refs == Set(("dev", "branch", 1L), ("v1", "tag", 2L)))
      val cur = Snapshots.metaSnapshots(s, root).collect()
        .filter(_.getLong(4) == 1L).map(_.getLong(0)).toSeq
      assert(cur == Seq(2L), s"exactly the current snapshot flagged, got $cur")
    } finally rm(root)
  }
}
