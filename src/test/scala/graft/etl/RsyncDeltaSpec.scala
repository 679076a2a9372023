package graft.etl

import java.nio.charset.StandardCharsets.US_ASCII

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The rsync delta kernel's algorithmic invariants, beyond the driver's
  * hash gate (which pins counts, the instruction stream, and the
  * applied-md5 against the DuckDB replay):
  *
  *  - the O(1) rolling weak-checksum update equals the from-scratch sum
  *    at every offset (the property that makes the scan linear),
  *  - the emitted instruction stream, applied by an INDEPENDENT
  *    interpreter (old blocks + literal bytes off the wire), rebuilds
  *    the new file byte-for-byte — re-verified with the A5 BSD-sum
  *    kernel, the same post-transfer verify the reference runs after
  *    its rsync (DownloadDatabase.pm:148-170),
  *  - identical files are pure copy (resume costs ~0 bytes), disjoint
  *    files are pure literal, and a non-aligned edit re-aligns
  *    mid-block onto the old suffix.
  */
class RsyncDeltaSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(421)

  private def randBytes(n: Int): Array[Byte] = {
    val a = new Array[Byte](n); rnd.nextBytes(a); a
  }

  private def fields(old: Array[Byte], nw: Array[Byte], b: Int) = {
    val r = RsyncDeltaImpl.row(old, nw, b)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getUTF8String(4).toString, r.getUTF8String(5).toString)
  }

  /** Independent delta application: walk the instruction stream, taking
    * C<k> from the OLD file's block table and L<n> literal bytes from
    * the wire (modeled as the corresponding span of the new file — the
    * bytes the sender would ship).
    */
  private def apply(instr: String, old: Array[Byte], nw: Array[Byte], b: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(nw.length)
    var wire = 0 // literal cursor: tracks output length (literals ship in stream order)
    if (instr.nonEmpty) instr.split('|').foreach { tok =>
      if (tok.startsWith("C")) {
        out.write(old, tok.drop(1).toInt * b, b)
        wire += b
      } else {
        val n = tok.drop(1).toInt
        out.write(nw, wire, n)
        wire += n
      }
    }
    out.toByteArray
  }

  test("rolling weak checksum equals from-scratch at every slide") {
    for (b <- Seq(16, 32, 64); trial <- 1 to 5) {
      val data = randBytes(b + 200)
      var w = RsyncDeltaImpl.weakInit(data, 0, b)
      for (p <- 1 to 200) {
        w = RsyncDeltaImpl.weakRoll(w, data(p - 1), data(p + b - 1), b)
        assert(w == RsyncDeltaImpl.weakInit(data, p, b), s"b=$b trial=$trial pos=$p")
      }
    }
  }

  test("identical files: pure copy, zero literals except the sub-block tail") {
    val old = randBytes(325) // 10 blocks of 32 + 5-byte tail
    val (nb, nCopy, lit, saved, instr, _) = fields(old, old, 32)
    assert(nb == 10 && nCopy == 10 && lit == 5 && saved == 320)
    assert(instr == (0 until 10).map("C" + _).mkString("|") + "|L5")
  }

  test("disjoint files: pure literal, zero copies") {
    val old = randBytes(320)
    val nw = Array.fill[Byte](200)(7)
    val (_, nCopy, lit, saved, instr, _) = fields(old, nw, 32)
    assert(nCopy == 0 && lit == 200 && saved == 0 && instr == "L200")
  }

  test("degenerate shapes: sub-block old, empty files, block larger than both") {
    val md5empty = "d41d8cd98f00b204e9800998ecf8427e"
    // old shorter than one block: zero blocks, everything literal
    val (nb1, c1, l1, _, i1, _) = fields(randBytes(20), randBytes(100), 32)
    assert(nb1 == 0 && c1 == 0 && l1 == 100 && i1 == "L100")
    // empty new: no instructions, reconstruction is the empty file
    val (_, c2, l2, _, i2, m2) = fields(randBytes(100), Array.emptyByteArray, 32)
    assert(c2 == 0 && l2 == 0 && i2 == "" && m2 == md5empty)
    // empty old against content: pure literal
    val nw3 = randBytes(50)
    val (nb3, c3, l3, _, i3, _) = fields(Array.emptyByteArray, nw3, 32)
    assert(nb3 == 0 && c3 == 0 && l3 == 50 && i3 == "L50")
    // block size exceeding both files: degenerates to literal transfer
    val (nb4, c4, l4, _, _, _) = fields(randBytes(40), randBytes(40), 64)
    assert(nb4 == 0 && c4 == 0 && l4 == 40)
  }

  test("applied instruction stream rebuilds the new file; BSD-sum verify passes") {
    for (trial <- 1 to 20) {
      val b = Seq(16, 32, 64)(trial % 3)
      val old = randBytes(200 + rnd.nextInt(2000))
      // random edit script: delete a span, insert junk, maybe swap a region
      val delAt = rnd.nextInt(old.length / 2)
      val delLen = rnd.nextInt(100)
      val ins = randBytes(rnd.nextInt(80))
      val nw = old.take(delAt) ++ ins ++ old.drop(delAt + delLen)
      val (_, nCopy, lit, _, instr, appliedMd5) = fields(old, nw, b)
      assert(lit + nCopy * b == nw.length, "instruction accounting must cover new exactly")
      val rebuilt = apply(instr, old, nw, b)
      assert(java.util.Arrays.equals(rebuilt, nw), s"trial $trial: reconstruction differs")
      // the reference's post-transfer verify, on the REBUILT bytes
      assert(BsdSumImpl.compute(rebuilt) == BsdSumImpl.compute(nw))
      val md = java.security.MessageDigest.getInstance("MD5")
      assert(appliedMd5 == md.digest(nw).map(x => f"$x%02x").mkString)
    }
  }

  test("non-aligned edit re-aligns mid-block: the suffix copies again") {
    // delete 7 bytes (not a multiple of 32) from the middle — every later
    // old block sits at a new offset not congruent to the block grid, and
    // ONLY a rolling scan (not block-aligned comparison) can re-match them
    val old = randBytes(640) // 20 blocks
    val nw = old.take(301) ++ old.drop(308)
    val (_, nCopy, _, saved, _, _) = fields(old, nw, 32)
    assert(nCopy >= 17, s"expected near-full re-alignment, got $nCopy copies")
    assert(saved >= 17 * 32)
  }

  test("registered query: instruction streams show copy/realign shape on real docs (sf0.001)") {
    val rows = RsyncDeltas.rsyncDeltaQuery(TestSpark.spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nCopy, lit, instr) = (r.getLong(2), r.getLong(3), r.getString(5))
      assert(instr.startsWith("C0|C1|C2"), s"leading unmutated blocks must copy: $instr")
      assert(lit >= 16, "the inserted marker must go literal")
      assert(nCopy >= 3, "the old suffix must re-align after the edit")
    }
  }
}
