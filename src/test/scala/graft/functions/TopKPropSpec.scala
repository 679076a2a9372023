package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the top-k mergeability theorem the B30/C9 operators
  * rest on: for ANY stream of (key, payload) pairs, ANY partitioning into
  * buffers, and ANY merge order (including serialize round-trips), the
  * merged buffer equals the top-k of the whole stream under the total
  * order (key DESC, payload ASC) — zero error, unlike a sketch. Seeded
  * generator draws cover adversarial interleavings, duplicate keys and
  * duplicate pairs that example tests miss.
  */
class TopKPropSpec extends AnyFunSuite {

  private def aggOf(k: Int) = TopKAggregate(null, null, k)

  // small key range → dense ties; payload range overlaps to exercise the
  // secondary order; duplicates of the SAME pair are common on purpose
  private val pair: Gen[(Long, Long)] = for {
    k <- Gen.choose(0L, 12L)
    p <- Gen.choose(0L, 30L)
  } yield (k, p)
  private val caseGen: Gen[(List[(Long, Long)], List[Int], Int)] = for {
    n <- Gen.choose(0, 300)
    ps <- Gen.listOfN(n, pair)
    cuts <- Gen.listOfN(4, Gen.choose(0, n))
    k <- Gen.choose(1, 9)
  } yield (ps, cuts.sorted, k)

  test("merged partial buffers equal the whole-stream top-k for any split and k") {
    (1 to 300).foreach { i =>
      val (ps, cs, k) = caseGen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val agg = aggOf(k)
      val bounds = (0 :: cs) :+ ps.length
      val parts = bounds.zip(bounds.tail).map { case (a, b) => ps.slice(a, b) }
      val buffers = parts.map { p =>
        val b = new TopKBuffer(k)
        p.foreach { case (key, v) => b.offer(key, v) }
        assert(b.size <= k, s"seed $i: buffer exceeded k")
        b
      }
      // fold right-to-left with a serialize round-trip on every merge input
      val merged = buffers.reduceRight { (a, acc) =>
        agg.merge(a, agg.deserialize(agg.serialize(acc)))
      }
      val expect = ps.sortBy { case (key, v) => (-key, v) }.take(k)
      val got = (0 until merged.size).map(j => (merged.keys(j), merged.vals(j)))
      assert(got == expect, s"seed $i (k=$k): $got != $expect")
    }
  }
}
