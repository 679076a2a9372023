package graft.etl

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Write-audit-publish edges the oracled `snapshot_wap` relation can't
  * show: invisibility of unaudited rows WHILE the audit runs, complete
  * erasure on rejection and on audit crash, and the guarded adoption
  * conflicting when main advances mid-audit — each interleaving driven
  * deterministically from inside the audit closure itself.
  */
class SnapshotWapSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private def tmpRoot(): Path = Files.createTempDirectory("graft_wapspec")

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  private def block(tag: Int, rows: Int = 100) = {
    val sq = s; import sq.implicits._
    (0 until rows).map(i => (tag.toLong, i.toLong)).toDF("tag", "i")
  }

  private def orphans(root: Path): Seq[String] = {
    val referenced = {
      val dir = root.resolve("manifests")
      val l = Files.list(dir)
      val ids = try l.iterator().asScala
        .map(_.getFileName.toString.stripPrefix("manifest-").toInt).toSeq
      finally l.close()
      ids.flatMap(Snapshots.manifest(root, _)).map(_.relPath).toSet
    }
    val walk = Files.walk(root.resolve("data"))
    try walk.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => root.relativize(p).toString).filterNot(referenced).toSeq
    finally walk.close()
  }

  test("unaudited rows are invisible to main readers even while the audit is running") {
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, block(1))
      var auditSawCleanMain = false
      val ok = Snapshots.publishAudited(s, root, block(2), audit = { branchView =>
        // mid-audit: the branch sees the append, main does not
        auditSawCleanMain = Snapshots.readCurrent(s, root).count() == 100
        branchView.count() == 200
      })
      assert(ok && auditSawCleanMain)
      assert(Snapshots.readCurrent(s, root).count() == 200)
    } finally rm(root)
  }

  test("a rejected release is erased completely: manifest, files, ref — and the branch name is reusable") {
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, block(1))
      assert(!Snapshots.publishAudited(s, root, block(2), audit = _ => false))
      assert(Snapshots.currentId(root).contains(1))
      assert(Snapshots.refId(root, "wap").isEmpty)
      assert(!Files.exists(root.resolve("manifests").resolve("manifest-2")))
      assert(orphans(root).isEmpty, s"rejected staging leaked: ${orphans(root)}")
      // the same branch name publishes cleanly afterwards
      assert(Snapshots.publishAudited(s, root, block(3), audit = _ => true))
      assert(Snapshots.readCurrent(s, root).count() == 200)
    } finally rm(root)
  }

  test("an audit that throws cleans up like a rejection, then rethrows") {
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, block(1))
      val boom = intercept[RuntimeException] {
        Snapshots.publishAudited(s, root, block(2),
          audit = _ => throw new RuntimeException("audit infra died"))
      }
      assert(boom.getMessage == "audit infra died")
      assert(Snapshots.currentId(root).contains(1))
      assert(Snapshots.refId(root, "wap").isEmpty)
      assert(orphans(root).isEmpty)
    } finally rm(root)
  }

  test("main advancing mid-audit makes adoption conflict loudly, never a silent rollback") {
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, block(1))
      intercept[Snapshots.CommitConflictException] {
        Snapshots.publishAudited(s, root, block(2), audit = { _ =>
          // a concurrent writer lands on main between stage and adopt
          Snapshots.publish(s, root, block(9), append = true)
          true
        })
      }
      // the concurrent commit SURVIVES; the audited release is erased
      assert(Snapshots.readCurrent(s, root).select("tag").distinct()
        .collect().map(_.getLong(0)).toSet == Set(1L, 9L))
      assert(Snapshots.refId(root, "wap").isEmpty)
      assert(orphans(root).isEmpty)
      // and the retry from the new base lands
      assert(Snapshots.publishAudited(s, root, block(2), audit = _ => true))
      assert(Snapshots.readCurrent(s, root).count() == 300)
    } finally rm(root)
  }
}
