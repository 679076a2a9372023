package graft.etl

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** A19 executed: the mirror loop over a real (local-filesystem)
  * transport — fetch, byte-offset resume, diverged-file refetch,
  * rsync-style delete, per-file retry with mid-write crash recovery,
  * post-sync size verification.
  */
class TransferSpec extends AnyFunSuite {

  private def write(p: Path, s: String): Unit = { Files.write(p, s.getBytes("UTF-8")); () }
  private def read(p: Path): String = new String(Files.readAllBytes(p), "UTF-8")

  private def mkRemote(): Path = {
    val remote = Files.createTempDirectory("xfer_remote")
    write(remote.resolve("a.txt"), "alpha-content")
    write(remote.resolve("b.txt"), "bravo-content-longer")
    write(remote.resolve("c.txt"), "charlie")
    remote
  }

  test("sync mirrors: fetch missing, resume partial, refetch diverged, delete extras, keep matches") {
    val remote = mkRemote()
    val local = Files.createTempDirectory("xfer_local")
    write(local.resolve("b.txt"), "bravo-c")          // correct 7-byte prefix → resume
    write(local.resolve("c.txt"), "charlie-DIVERGED") // longer than remote → refetch
    write(local.resolve("zombie.txt"), "gone remotely") // local-only → delete
    val results = Transfer.sync(new Transfer.LocalTransport(remote), local)
      .map(r => r.file -> r).toMap
    assert(results("a.txt").action == "fetch" && results("a.txt").bytesMoved == 13L)
    assert(results("b.txt").action == "resume" && results("b.txt").bytesMoved == 13L,
      "resume must move only the missing tail")
    assert(results("c.txt").action == "refetch" && results("c.txt").bytesMoved == 7L)
    assert(results("zombie.txt").action == "delete")
    // the mirror now equals the remote, byte for byte
    val names = Files.list(local).iterator().asScala.map(_.getFileName.toString).toSet
    assert(names == Set("a.txt", "b.txt", "c.txt"))
    names.foreach(n => assert(read(local.resolve(n)) == read(remote.resolve(n)), n))
    // a second sync is a no-op: everything keeps, nothing moves
    assert(Transfer.sync(new Transfer.LocalTransport(remote), local)
      .forall(r => r.action == "keep" && r.bytesMoved == 0L))
  }

  test("a fetch that dies mid-write is resumed from the surviving prefix on retry") {
    val remote = mkRemote()
    val local = Files.createTempDirectory("xfer_local2")
    // writes half the bytes then throws, once per file; the retry must
    // resume AFTER the surviving prefix, not re-append from the plan
    val inner = new Transfer.LocalTransport(remote)
    val flaky = new Transfer.Transport {
      private val failed = scala.collection.mutable.Set[String]()
      override def ls(): Seq[(String, Long)] = inner.ls()
      override def fetch(name: String, offset: Long, dest: Path): Long =
        if (failed.add(name)) {
          val total = ls().toMap.apply(name)
          val half = (total - offset) / 2
          if (half > 0) {
            val buf = Files.readAllBytes(remote.resolve(name))
              .slice(offset.toInt, (offset + half).toInt)
            Files.write(dest, buf,
              java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
          }
          throw new java.io.IOException(s"simulated mid-write death on $name")
        } else inner.fetch(name, offset, dest)
    }
    val results = Transfer.sync(flaky, local)
    assert(results.forall(_.attempts == 2), results.toString)
    // every file still verifies and matches the remote bytes exactly
    Files.list(local).iterator().asScala.foreach { p =>
      assert(read(p) == read(remote.resolve(p.getFileName.toString)), p.toString)
    }
  }

  test("a file that exhausts its retries fails the sync loudly") {
    val remote = mkRemote()
    val local = Files.createTempDirectory("xfer_local3")
    val broken = new Transfer.Transport {
      override def ls(): Seq[(String, Long)] = Seq(("a.txt", 13L))
      override def fetch(name: String, offset: Long, dest: Path): Long =
        throw new java.io.IOException("remote gone")
    }
    val e = intercept[java.io.IOException](Transfer.sync(broken, local, retries = 2))
    assert(e.getMessage.contains("after 2 attempts"))
  }
}
