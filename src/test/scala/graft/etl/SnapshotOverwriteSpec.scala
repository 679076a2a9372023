package graft.etl

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition overwrite on the snapshot layer — edges the oracled
  * `snapshot_overwrite` relation doesn't exercise: multi-partition
  * commits, brand-new partitions, the loud non-partitioned refusal,
  * tombstone seq interplay, and GC of replaced partitions including the
  * nested crumb dirs the partitioned layout leaves behind.
  */
class SnapshotOverwriteSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private def tmpRoot(): Path = Files.createTempDirectory("graft_owspec")

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  private def rows(pairs: (String, Long)*) = {
    val sq = s; import sq.implicits._
    pairs.toDF("p", "v")
  }

  private def state(root: Path): Set[(String, Long)] =
    Snapshots.readCurrent(s, root).collect()
      .map(r => (r.getAs[String]("p"), r.getAs[Long]("v"))).toSet

  test("one commit can replace several partitions and append a new one; the rest carry") {
    val root = tmpRoot()
    try {
      Snapshots.publishOverwrite(s, root,
        rows(("a", 1L), ("b", 2L), ("c", 3L)), "p")
      Snapshots.publishOverwrite(s, root,
        rows(("a", 10L), ("c", 30L), ("d", 40L)), "p")
      assert(state(root) == Set(("a", 10L), ("b", 2L), ("c", 30L), ("d", 40L)))
      // b's file is the snapshot-1 entry verbatim
      val m1 = Snapshots.manifest(root, 1).map(e => e.relPath -> e.md5).toMap
      val bCarried = Snapshots.manifest(root, 2).filter(_.relPath.contains("_pv=b"))
      assert(bCarried.nonEmpty && bCarried.forall(e => m1.get(e.relPath).contains(e.md5)))
      // time travel: snapshot 1 untouched
      assert(Snapshots.readAt(s, root, 1).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet ==
        Set(("a", 1L), ("b", 2L), ("c", 3L)))
    } finally rm(root)
  }

  test("a table not founded partitioned refuses overwrite loudly") {
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, rows(("a", 1L)))
      val e = intercept[IllegalStateException] {
        Snapshots.publishOverwrite(s, root, rows(("a", 2L)), "p")
      }
      assert(e.getMessage.contains("value-pure"))
    } finally rm(root)
  }

  test("overwriting a partition outruns its earlier tombstones; untouched partitions keep theirs") {
    val sq = s; import sq.implicits._
    val root = tmpRoot()
    try {
      Snapshots.publishOverwrite(s, root,
        rows(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)), "p")
      // tombstone v=1 erases one row from EACH partition
      Snapshots.publishDeletes(s, root, Seq(1L).toDF("v"))
      assert(state(root) == Set(("a", 2L), ("b", 2L)))
      // replace partition a with rows that include the deleted value:
      // the new file's seq outranks the tombstone, so v=1 lives in a...
      Snapshots.publishOverwrite(s, root, rows(("a", 1L), ("a", 3L)), "p")
      // ...while b (carried with its ORIGINAL seq) keeps the tombstone applying
      assert(state(root) == Set(("a", 1L), ("a", 3L), ("b", 2L)))
    } finally rm(root)
  }

  test("expiring pre-overwrite history reclaims replaced files AND nested crumb dirs; carried files survive") {
    val root = tmpRoot()
    try {
      Snapshots.publishOverwrite(s, root, rows(("a", 1L), ("b", 2L)), "p")
      Snapshots.publishOverwrite(s, root, rows(("a", 10L)), "p")
      val (n, bytes) = Snapshots.expire(root, keepFrom = 2)
      assert(n > 0 && bytes > 0, "replaced partition files were not reclaimed")
      assert(state(root) == Set(("a", 10L), ("b", 2L)))
      assert(Snapshots.verify(root, 2).isEmpty, "carried files corrupted by GC")
      // the snap-00001 dir must be fully gone: its only parquet (a's old
      // file) was reclaimed, b's carried file lives there... unless shared.
      // b's file IS shared into manifest 2, so snap-00001 survives with it;
      // but no _pv=a crumbs remain anywhere
      val walk = Files.walk(root.resolve("data"))
      val leftovers = try walk.iterator().asScala
        .filter(p => p.toString.contains("_pv=a") && !p.toString.contains("snap-00002"))
        .toSeq
      finally walk.close()
      assert(leftovers.isEmpty, s"replaced-partition crumbs: $leftovers")
    } finally rm(root)
  }

  test("a fully-replaced snapshot dir is swept to nothing, nested dirs included") {
    val root = tmpRoot()
    try {
      Snapshots.publishOverwrite(s, root, rows(("a", 1L), ("b", 2L)), "p")
      // replace BOTH partitions, so nothing of snapshot 1 is shared
      Snapshots.publishOverwrite(s, root, rows(("a", 10L), ("b", 20L)), "p")
      Snapshots.expire(root, keepFrom = 2)
      assert(!Files.exists(root.resolve("data").resolve("snap-00001")),
        "empty partitioned snap dir (crumbs only) survived GC")
      assert(state(root) == Set(("a", 10L), ("b", 20L)))
    } finally rm(root)
  }
}
