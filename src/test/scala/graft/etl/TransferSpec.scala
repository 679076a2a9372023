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

  test("a diverged file over a delta-capable transport moves the delta, not the file") {
    val rnd = new scala.util.Random(7)
    val old = new Array[Byte](8000); rnd.nextBytes(old)
    // remote mutates: 600 bytes deleted mid-file, 16 inserted — the new
    // file is SMALLER than the local survivor, the diverged-file branch
    val marker = "DELTA_MUTATION!!".getBytes("UTF-8")
    val nw = old.take(3000) ++ marker ++ old.drop(3600)
    val remote = Files.createTempDirectory("xfer_remote_d")
    Files.write(remote.resolve("db.dat"), nw)
    def freshLocal(): Path = {
      val local = Files.createTempDirectory("xfer_local_d")
      Files.write(local.resolve("db.dat"), old)
      local
    }
    // A-leg: plain transport refetches — wire cost is the WHOLE file
    val localA = freshLocal()
    val refetch = Transfer.sync(new Transfer.LocalTransport(remote), localA)
      .find(_.file == "db.dat").get
    assert(refetch.action == "refetch" && refetch.bytesMoved == nw.length.toLong)
    // B-leg: delta transport rebuilds from the local base — wire cost is
    // block sums + instructions + literals, a fraction of the file
    val localB = freshLocal()
    val delta = Transfer.sync(new Transfer.LocalDeltaTransport(remote), localB)
      .find(_.file == "db.dat").get
    assert(delta.action == "delta", delta.toString)
    assert(delta.bytesMoved < nw.length / 4,
      s"delta moved ${delta.bytesMoved} of ${nw.length} — no saving")
    // both mirrors hold the remote bytes exactly; the A5 verify agrees
    Seq(localA, localB).foreach { l =>
      assert(java.util.Arrays.equals(Files.readAllBytes(l.resolve("db.dat")), nw), l.toString)
      assert(BsdSumImpl.compute(Files.readAllBytes(l.resolve("db.dat")))
        == BsdSumImpl.compute(nw))
    }
    // second sync over the delta transport: keep, nothing moves
    assert(Transfer.sync(new Transfer.LocalDeltaTransport(remote), localB)
      .forall(r => r.action == "keep" && r.bytesMoved == 0L))
  }

  test("delta against a missing/garbage base degrades to literals, never corrupts") {
    val remote = Files.createTempDirectory("xfer_remote_d2")
    val content = ("x" * 3000).getBytes("UTF-8")
    Files.write(remote.resolve("f.dat"), content)
    val dest = Files.createTempDirectory("xfer_local_d2").resolve("f.dat")
    Files.write(dest, "completely unrelated garbage base".getBytes("UTF-8"))
    val t = new Transfer.LocalDeltaTransport(remote)
    val moved = t.fetchDelta("f.dat", dest)
    assert(java.util.Arrays.equals(Files.readAllBytes(dest), content))
    // nothing matched, so the wire carried at least the whole file
    assert(moved >= content.length.toLong)
  }

  // ---- the FTP wire transport against an in-process server double ----

  test("FTP transport drives the full mirror: fetch, resume, refetch, delete, keep") {
    val remote = mkRemote()
    val local = Files.createTempDirectory("xfer_ftp1")
    write(local.resolve("b.txt"), "bravo-c")           // prefix → resume
    write(local.resolve("c.txt"), "charlie-DIVERGED")  // diverged → refetch
    write(local.resolve("zombie.txt"), "gone remotely")
    val server = new MiniFtpServer(remote)
    try {
      val ftp = new FtpTransport("127.0.0.1", server.port)
      try {
        assert(ftp.ls() == Seq(("a.txt", 13L), ("b.txt", 20L), ("c.txt", 7L)),
          "NLST+SIZE listing must match the remote dir")
        val results = Transfer.sync(ftp, local).map(r => r.file -> r).toMap
        assert(results("a.txt").action == "fetch" && results("a.txt").bytesMoved == 13L)
        assert(results("b.txt").action == "resume" && results("b.txt").bytesMoved == 13L)
        assert(results("c.txt").action == "refetch" && results("c.txt").bytesMoved == 7L)
        assert(results("zombie.txt").action == "delete")
        // the resume went over the wire as REST 7, not a refetch
        assert(server.retrLog.asScala.toSeq.contains(("b.txt", 7L)), server.retrLog.toString)
        val names = Files.list(local).iterator().asScala.map(_.getFileName.toString).toSet
        assert(names == Set("a.txt", "b.txt", "c.txt"))
        names.foreach(n => assert(read(local.resolve(n)) == read(remote.resolve(n)), n))
        // second sync over the same live connection: all keep
        assert(Transfer.sync(ftp, local).forall(r => r.action == "keep" && r.bytesMoved == 0L))
      } finally ftp.close()
    } finally server.close()
  }

  test("a RETR aborted mid-stream (426) leaves a prefix the retry RESTs past") {
    val remote = mkRemote()
    val local = Files.createTempDirectory("xfer_ftp2")
    val server = new MiniFtpServer(remote)
    // first two RETRs of b.txt stream 5 bytes then abort with 426
    server.failRetr("b.txt", times = 2, afterBytes = 5L)
    try {
      val ftp = new FtpTransport("127.0.0.1", server.port)
      try {
        val results = Transfer.sync(ftp, local).map(r => r.file -> r).toMap
        assert(results("b.txt").attempts == 3, results.toString)
        // wire evidence of prefix resume: RETR at 0, then REST 5, then REST 10
        val bRetrs = server.retrLog.asScala.toSeq.filter(_._1 == "b.txt").map(_._2)
        assert(bRetrs == Seq(0L, 5L, 10L), bRetrs.toString)
        assert(read(local.resolve("b.txt")) == read(remote.resolve("b.txt")))
        // the two clean files took one attempt each
        assert(results("a.txt").attempts == 1 && results("c.txt").attempts == 1)
      } finally ftp.close()
    } finally server.close()
  }

  // ---- the failure matrix: the two real-world FTP pathologies the ----
  // ---- reference's BSD-sum verify exists to catch                 ----

  /** The reference's CHECKSUMS-manifest verify (A5/A6), spec-side: BSD
    * sum of every expected file vs the mirrored bytes; missing files and
    * content mismatches are the flags.
    */
  private def manifestVerify(expected: Map[String, String], local: Path): Map[String, String] =
    expected.flatMap { case (name, sum) =>
      val p = local.resolve(name)
      if (!Files.exists(p)) Some(name -> "MISSING")
      else {
        val actual = BsdSumImpl.compute(Files.readAllBytes(p))
        if (actual != sum) Some(name -> s"MISMATCH($actual)") else None
      }
    }

  test("truncated NLST turns --delete into data loss; the manifest verify catches it") {
    val remote = mkRemote()
    val local = Files.createTempDirectory("xfer_ftp4")
    val server = new MiniFtpServer(remote)
    try {
      val ftp = new FtpTransport("127.0.0.1", server.port)
      try {
        // clean first mirror; record the release's CHECKSUMS manifest
        Transfer.sync(ftp, local)
        val manifest = Seq("a.txt", "b.txt", "c.txt")
          .map(n => n -> BsdSumImpl.compute(Files.readAllBytes(remote.resolve(n)))).toMap
        assert(manifestVerify(manifest, local).isEmpty, "clean mirror must verify")
        // the server now truncates the listing to ONE name but still
        // replies 226 complete — the sync plan sees b/c as local-only
        // and rsync-deletes them: the damage is real and silent
        server.truncateNlst(1)
        val results = Transfer.sync(ftp, local).map(r => r.file -> r.action).toMap
        assert(results == Map("a.txt" -> "keep", "b.txt" -> "delete", "c.txt" -> "delete"),
          results.toString)
        // ...and ONLY the post-sync manifest verify flags the loss
        val flags = manifestVerify(manifest, local)
        assert(flags == Map("b.txt" -> "MISSING", "c.txt" -> "MISSING"), flags.toString)
      } finally ftp.close()
    } finally server.close()
  }

  test("SIZE overstating the stream: fetch lands short and verification fails loudly") {
    val remote = mkRemote()
    val local = Files.createTempDirectory("xfer_ftp5")
    val server = new MiniFtpServer(remote)
    server.lieSize("a.txt", 99L) // RETR will stream the true 13 bytes
    try {
      val ftp = new FtpTransport("127.0.0.1", server.port)
      try {
        val e = intercept[IllegalArgumentException](Transfer.sync(ftp, local))
        assert(e.getMessage.contains("a.txt verification failed"), e.getMessage)
        assert(e.getMessage.contains("size 13") && e.getMessage.contains("remote 99"))
      } finally ftp.close()
    } finally server.close()
  }

  test("SIZE understating the stream: a full local copy is needlessly refetched, then flagged") {
    val remote = mkRemote()
    val local = Files.createTempDirectory("xfer_ftp6")
    write(local.resolve("b.txt"), "bravo-content-longer") // already perfect (20 bytes)
    val server = new MiniFtpServer(remote)
    server.lieSize("b.txt", 5L) // lie: local 20 > claimed 5 → plan says refetch
    try {
      val ftp = new FtpTransport("127.0.0.1", server.port)
      try {
        val e = intercept[IllegalArgumentException](Transfer.sync(ftp, local))
        assert(e.getMessage.contains("b.txt verification failed"), e.getMessage)
        assert(e.getMessage.contains("size 20") && e.getMessage.contains("remote 5"))
      } finally ftp.close()
    } finally server.close()
  }

  test("same-size content drift passes every size gate; only the BSD-sum verify flags it") {
    val remote = mkRemote()
    val local = Files.createTempDirectory("xfer_ftp7")
    val server = new MiniFtpServer(remote)
    try {
      val ftp = new FtpTransport("127.0.0.1", server.port)
      try {
        Transfer.sync(ftp, local)
        val manifest = Seq("a.txt", "b.txt", "c.txt")
          .map(n => n -> BsdSumImpl.compute(Files.readAllBytes(remote.resolve(n)))).toMap
        // remote a.txt mutates to DIFFERENT bytes of the SAME length:
        // SIZE is honest, the plan says keep, nothing is transferred
        write(remote.resolve("a.txt"), "ALPHA-CONTENT")
        assert(Transfer.sync(ftp, local).forall(_.action != "fetch"))
        // the manifest verify is the only gate that sees the drift
        val flags = manifestVerify(manifest, local)
        assert(flags.isEmpty, "local still matches the RECORDED release manifest")
        val freshManifest = Seq("a.txt", "b.txt", "c.txt")
          .map(n => n -> BsdSumImpl.compute(Files.readAllBytes(remote.resolve(n)))).toMap
        val drift = manifestVerify(freshManifest, local)
        assert(drift.keySet == Set("a.txt") && drift("a.txt").startsWith("MISMATCH"),
          drift.toString)
      } finally ftp.close()
    } finally server.close()
  }

  test("FTP transport surfaces an exhausted-retries failure like any transport") {
    val remote = mkRemote()
    val local = Files.createTempDirectory("xfer_ftp3")
    val server = new MiniFtpServer(remote)
    server.failRetr("a.txt", times = 99, afterBytes = 0L)
    try {
      val ftp = new FtpTransport("127.0.0.1", server.port)
      try {
        val e = intercept[java.io.IOException](Transfer.sync(ftp, local, retries = 2))
        assert(e.getMessage.contains("a.txt failed after 2 attempts"))
      } finally ftp.close()
    } finally server.close()
  }
}
