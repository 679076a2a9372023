package graft.etl

import java.nio.file.{Files, Path}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import scala.collection.JavaConverters._

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Optimistic concurrency on the snapshot layer: the expensive data
  * write happens OUTSIDE any lock; the commit validates against the
  * table state at commit time. What the oracled `snapshot_occ` relation
  * can't show: genuinely overlapping writers, the torn-read guarantee
  * under an OCC storm, garbage hygiene after a lost race, and recovery
  * past a crash between manifest write and pointer swap.
  */
class SnapshotOccSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private def tmpRoot(): Path = Files.createTempDirectory("graft_occspec")

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  private def block(tag: Int, rows: Int = 100) = {
    val sq = s; import sq.implicits._
    (0 until rows).map(i => (tag.toLong, i.toLong)).toDF("tag", "i")
  }

  test("OCC writer storm: stage phases overlap, every append commits exactly once, zero torn reads") {
    val root = tmpRoot()
    try {
      val writers = 4; val each = 3
      val pool = java.util.concurrent.Executors.newFixedThreadPool(writers + 1)
      val torn = new AtomicInteger(0)
      val stopReader = new AtomicBoolean(false)
      val reader = pool.submit(new Runnable { def run(): Unit =
        while (!stopReader.get()) {
          Snapshots.currentId(root).foreach { _ =>
            if (Snapshots.readCurrent(s, root).count() % 100 != 0) torn.incrementAndGet()
          }
        }
      })
      val tasks = (0 until writers).map { w =>
        pool.submit(new java.util.concurrent.Callable[Seq[Int]] { def call(): Seq[Int] =
          (0 until each).map { i =>
            Snapshots.publishOcc(s, root, block(w * 100 + i))
          }
        })
      }
      val ids = tasks.flatMap(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      stopReader.set(true); reader.get(); pool.shutdown()
      assert(ids.sorted == (1 to writers * each), s"id collision/loss: ${ids.sorted}")
      assert(torn.get() == 0, s"${torn.get()} torn reads during the OCC storm")
      assert(Snapshots.readCurrent(s, root).count() == writers * each * 100L)
      assert(Snapshots.verify(root, Snapshots.currentId(root).get).isEmpty)
    } finally rm(root)
  }

  test("an append staged against a stale base rebases onto the latest manifest, never clobbers it") {
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, block(0))
      // both stagers read base 1; neither manifest exists yet
      val a = Snapshots.stageOcc(s, root, block(1))
      val b = Snapshots.stageOcc(s, root, block(2))
      val idA = Snapshots.commitOcc(root, a, Snapshots.OccAppend)
      val idB = Snapshots.commitOcc(root, b, Snapshots.OccAppend)
      assert(idA == 2 && idB == 3)
      // snapshot 2 holds exactly the first two blocks; 3 holds all three
      assert(Snapshots.readAt(s, root, 2).count() == 200)
      assert(Snapshots.readAt(s, root, 3).count() == 300)
      val tags = Snapshots.readCurrent(s, root)
        .select("tag").distinct().collect().map(_.getLong(0)).sorted.toSeq
      assert(tags == Seq(0L, 1L, 2L), s"lost a rebased append: $tags")
    } finally rm(root)
  }

  test("a rewrite staged against a moved base conflicts — committing it would undelete keys") {
    val sq = s; import sq.implicits._
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, (0L until 1000L).toDF("k").repartition(4))
      // the rewrite is staged BEFORE the delete commits, so its files
      // still contain every key the tombstone is about to erase…
      val stale = Snapshots.stageOcc(s, root,
        Snapshots.readAt(s, root, 1).repartition(2))
      Snapshots.publishDeletes(s, root,
        (0L until 1000L by 10L).toDF("k"))
      assert(Snapshots.readCurrent(s, root).count() == 900)
      // …and since rewritten files would take a seq above the
      // tombstone's, the sequence rule would stop applying it: the
      // commit MUST refuse
      intercept[Snapshots.CommitConflictException] {
        Snapshots.commitOcc(root, stale, Snapshots.OccRewrite(1))
      }
      Snapshots.discardStaged(root, stale)
      // retry from the new base folds the tombstone physically
      val (cid, conflicts) = Snapshots.compactOcc(s, root, targetFiles = 2)
      assert(conflicts == 0)
      assert(Snapshots.readAt(s, root, cid).count() == 900)
      assert(Snapshots.manifest(root, cid).forall(!_.relPath.startsWith("deletes/")))
    } finally rm(root)
  }

  test("a lost race leaves zero garbage: discarded staging is fully reclaimed") {
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, block(0))
      val stale = Snapshots.stageOcc(s, root, block(1))
      Snapshots.publishOcc(s, root, block(2))
      intercept[Snapshots.CommitConflictException] {
        Snapshots.commitOcc(root, stale, Snapshots.OccRewrite(1))
      }
      Snapshots.discardStaged(root, stale)
      // every parquet on disk is referenced by some manifest
      val referenced = (1 to Snapshots.currentId(root).get)
        .flatMap(n => Snapshots.manifest(root, n)).map(_.relPath).toSet
      val walk = Files.walk(root.resolve("data"))
      val onDisk = try walk.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => root.relativize(p).toString).toSet
      finally walk.close()
      assert((onDisk -- referenced).isEmpty, s"orphans: ${onDisk -- referenced}")
    } finally rm(root)
  }

  test("crash crumbs from atomicWrite never brick the store: scans skip them") {
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, block(0))
      Snapshots.createTag(root, "v1", 1)
      // simulate crashes mid-atomicWrite in every scanned directory
      Files.write(root.resolve("manifests").resolve(".manifest-2.tmp.deadbeef"),
        "junk".getBytes)
      Files.write(root.resolve("manifests").resolve("manifest-old.bak"),
        "junk".getBytes)
      Files.write(root.resolve("refs").resolve("tags").resolve(".v2.tmp.deadbeef"),
        "junk".getBytes)
      // every scan-based operation still works
      assert(Snapshots.publishOcc(s, root, block(1)) == 2)
      assert(Snapshots.metaSnapshots(s, root).count() == 2)
      assert(Snapshots.metaRefs(s, root).count() == 1)
      val (n, _) = Snapshots.expire(root, keepFrom = 2)
      assert(n == 0, "tag-pinned founding snapshot must survive")
      assert(Snapshots.readCurrent(s, root).count() == 200)
    } finally rm(root)
  }

  test("a failed rewrite (parity, not conflict) leaks no staged files") {
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, block(0))
      intercept[IllegalArgumentException] {
        Snapshots.rewriteOcc(s, root) { base =>
          Snapshots.stageOcc(s, root, base.filter("i % 2 = 0")) // drops rows
        }
      }
      val referenced = (1 to Snapshots.currentId(root).get)
        .flatMap(n => Snapshots.manifest(root, n)).map(_.relPath).toSet
      val walk = Files.walk(root.resolve("data"))
      val onDisk = try walk.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => root.relativize(p).toString).toSet
      finally walk.close()
      assert((onDisk -- referenced).isEmpty,
        s"failed rewrite leaked: ${onDisk -- referenced}")
    } finally rm(root)
  }

  test("expire on a pointer-less standalone store is a no-op: staged releases are never swept") {
    val root = tmpRoot()
    try {
      Snapshots.stage(s, root, block(1), append = false)
      Snapshots.stage(s, root, block(2), append = false)
      val (n, b) = Snapshots.expire(root, keepFrom = 2)
      assert(n == 0 && b == 0, "GC swept staged-but-uncommitted releases")
      // both staged releases still committable
      Snapshots.commit(root, 1)
      assert(Snapshots.readCurrent(s, root).count() == 100)
    } finally rm(root)
  }

  test("a crash between manifest write and pointer swap is stepped over, never overwritten") {
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, block(0))
      // simulate the crash: manifest-2 exists, pointer still says 1
      val orphan = root.resolve("manifests").resolve("manifest-2")
      Files.copy(root.resolve("manifests").resolve("manifest-1"), orphan)
      val id = Snapshots.publishOcc(s, root, block(1))
      assert(id == 3, s"next committer must allocate past the orphan, got $id")
      assert(Snapshots.currentId(root).contains(3))
      assert(Snapshots.readCurrent(s, root).count() == 200)
      // the orphan is untouched (time-travel-readable, GC'd by expire)
      assert(Files.exists(orphan))
    } finally rm(root)
  }
}
