package graft.etl

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Branch/tag refs on the snapshot layer — what the oracled
  * `snapshot_branch` relation doesn't show: file sharing across
  * lineages, ref lifecycle guards, the drop-ref → GC handoff,
  * adoption-as-rollback, and cross-lineage writer concurrency.
  */
class SnapshotBranchSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private def tmpRoot(): Path = Files.createTempDirectory("graft_brspec")

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  private def block(tag: Int, rows: Int = 100) = {
    val sq = s; import sq.implicits._
    (0 until rows).map(i => (tag.toLong, i.toLong)).toDF("tag", "i")
  }

  test("lineages share the fork point's files verbatim and never see each other's appends") {
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, block(1))
      Snapshots.createBranch(root, "dev", 1)
      Snapshots.publishToBranch(s, root, "dev", block(2))
      Snapshots.publish(s, root, block(3), append = true)
      val base = Snapshots.manifest(root, 1).toSet
      assert(base.subsetOf(Snapshots.manifest(root, Snapshots.refId(root, "dev").get).toSet))
      assert(base.subsetOf(Snapshots.manifest(root, Snapshots.currentId(root).get).toSet))
      def tags(df: org.apache.spark.sql.DataFrame) =
        df.select("tag").distinct().collect().map(_.getLong(0)).toSet
      assert(tags(Snapshots.readRefAt(s, root, "dev")) == Set(1L, 2L))
      assert(tags(Snapshots.readCurrent(s, root)) == Set(1L, 3L))
    } finally rm(root)
  }

  test("ref lifecycle guards: duplicate create, missing manifest, tag writes all refuse") {
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, block(1))
      Snapshots.createBranch(root, "dev", 1)
      Snapshots.createTag(root, "v1", 1)
      intercept[IllegalArgumentException] { Snapshots.createBranch(root, "dev", 1) }
      intercept[IllegalArgumentException] { Snapshots.createTag(root, "v1", 1) }
      intercept[IllegalArgumentException] { Snapshots.createBranch(root, "x", 99) }
      intercept[IllegalArgumentException] { Snapshots.createBranch(root, "a/b", 1) }
      intercept[IllegalArgumentException] {
        Snapshots.publishToBranch(s, root, "v1", block(2))
      }
      intercept[IllegalStateException] {
        Snapshots.publishToBranch(s, root, "ghost", block(2))
      }
    } finally rm(root)
  }

  test("a ref pins history against expire; dropping it hands the files to the next GC") {
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, block(1))
      Snapshots.createTag(root, "v1", 1)
      // replace everything so snapshot 1 shares nothing forward
      Snapshots.publish(s, root, block(2))
      val (n1, _) = Snapshots.expire(root, keepFrom = 2)
      assert(n1 == 0, s"GC reclaimed $n1 tag-pinned files")
      assert(Snapshots.verify(root, 1).isEmpty)
      assert(Snapshots.dropRef(root, "v1"))
      val (n2, b2) = Snapshots.expire(root, keepFrom = 2)
      assert(n2 > 0 && b2 > 0, "dropped ref's history was not reclaimed")
      assert(!Files.exists(root.resolve("manifests").resolve("manifest-1")))
      assert(Snapshots.readCurrent(s, root).count() == 100)
    } finally rm(root)
  }

  test("adopting an older branch head is an atomic rollback; later ids never collide") {
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, block(1))
      Snapshots.createBranch(root, "stable", 1)
      Snapshots.publish(s, root, block(2), append = true)
      Snapshots.publish(s, root, block(3), append = true)
      assert(Snapshots.currentId(root).contains(3))
      assert(Snapshots.adoptBranch(root, "stable") == 1)
      assert(Snapshots.readCurrent(s, root).count() == 100)
      // next publish must step past the rolled-back manifests
      val id = Snapshots.publish(s, root, block(4), append = true)
      assert(id == 4, s"post-rollback id collided: $id")
      assert(Snapshots.readCurrent(s, root)
        .select("tag").distinct().collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    } finally rm(root)
  }

  test("no write path can clobber a branch head: overwrite/delete/upsert allocate past it") {
    val sq = s; import sq.implicits._
    val root = tmpRoot()
    try {
      Snapshots.publishOverwrite(s, root,
        Seq(("a", 1L), ("b", 2L)).toDF("p", "v"), "p")
      Snapshots.createBranch(root, "dev", 1)
      Snapshots.publishToBranch(s, root, "dev", block(7)) // dev head = manifest-2
      val devHead = Snapshots.refId(root, "dev").get
      val devRows = Snapshots.readRefAt(s, root, "dev").count()
      // each of these once allocated currentId+1 (= 2) and would have
      // overwritten dev's manifest
      Snapshots.publishOverwrite(s, root, Seq(("a", 10L)).toDF("p", "v"), "p")
      Snapshots.publishDeletes(s, root, Seq(2L).toDF("v"))
      assert(Snapshots.refId(root, "dev").contains(devHead))
      assert(Snapshots.readRefAt(s, root, "dev").count() == devRows,
        "a main-line write clobbered the branch head's manifest")
    } finally rm(root)
  }

  test("a branch and a tag cannot share a name — refId would silently re-point on drop") {
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, block(1))
      Snapshots.publish(s, root, block(2), append = true)
      Snapshots.createBranch(root, "x", 1)
      intercept[IllegalArgumentException] { Snapshots.createTag(root, "x", 2) }
      Snapshots.createTag(root, "y", 2)
      intercept[IllegalArgumentException] { Snapshots.createBranch(root, "y", 1) }
    } finally rm(root)
  }

  test("main and a branch take concurrent writers without losing a commit") {
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, block(0))
      Snapshots.createBranch(root, "dev", 1)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      val main = pool.submit(new java.util.concurrent.Callable[Seq[Int]] {
        def call(): Seq[Int] = (1 to 3).map(i =>
          Snapshots.publishLocked(s, root, block(10 + i), append = true))
      })
      val dev = pool.submit(new java.util.concurrent.Callable[Seq[Int]] {
        def call(): Seq[Int] = (1 to 3).map(i =>
          Snapshots.publishToBranch(s, root, "dev", block(20 + i)))
      })
      val ids = main.get(120, java.util.concurrent.TimeUnit.SECONDS) ++
        dev.get(120, java.util.concurrent.TimeUnit.SECONDS)
      pool.shutdown()
      assert(ids.sorted == (2 to 7), s"id collision/loss across lineages: ${ids.sorted}")
      assert(Snapshots.readCurrent(s, root).count() == 400)
      assert(Snapshots.readRefAt(s, root, "dev").count() == 400)
      // and the two lineages stayed disjoint above the fork point
      val devTags = Snapshots.readRefAt(s, root, "dev")
        .select("tag").distinct().collect().map(_.getLong(0)).toSet
      assert(devTags == Set(0L, 21L, 22L, 23L), s"main leaked into dev: $devTags")
    } finally rm(root)
  }
}
