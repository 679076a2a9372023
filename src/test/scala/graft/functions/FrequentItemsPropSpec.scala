package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the Misra-Gries guarantee — the theorem the E11
  * operator's determinism rests on: for ANY stream, ANY partitioning of
  * it into buffers, and ANY merge order, every item with frequency
  * > N/(k+1) is in the merged candidate set, and no buffer ever exceeds
  * k entries. Example-based tests can't cover adversarial interleavings;
  * 200 seeded generator draws can. (Raw scalacheck Gen with fixed seeds —
  * deterministic, no scalatestplus bridge in the build.)
  */
class FrequentItemsPropSpec extends AnyFunSuite {

  private def row(s: String): InternalRow = InternalRow(UTF8String.fromString(s))
  private val agg = FrequentItemsSketch(BoundReference(0, StringType, nullable = true), 8)

  // streams over a small hot alphabet + an unbounded rare tail
  private val token: Gen[String] =
    Gen.frequency(5 -> Gen.oneOf("h1", "h2", "h3"), 3 -> Gen.choose(0, 10000).map(i => s"r$i"))
  private val caseGen: Gen[(List[String], List[Int])] = for {
    n <- Gen.choose(50, 400)
    toks <- Gen.listOfN(n, token)
    cuts <- Gen.listOfN(3, Gen.choose(0, n))
  } yield (toks, cuts.sorted)

  test("any >N/(k+1) item survives any partitioning and merge order; buffers stay <= k") {
    (1 to 200).foreach { i =>
      val (toks, cs) = caseGen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val bounds = (0 :: cs) :+ toks.length
      val parts = bounds.zip(bounds.tail).map { case (a, b) => toks.slice(a, b) }
      val buffers = parts.map { p =>
        val b = agg.createAggregationBuffer()
        p.foreach(t => agg.update(b, row(t)))
        assert(b.size <= 8, s"seed $i: partial buffer exceeded k: ${b.size}")
        b
      }
      val merged = buffers.reduce((a, c) => agg.merge(a, agg.deserialize(agg.serialize(c))))
      assert(merged.size <= 8, s"seed $i: merged buffer exceeded k: ${merged.size}")
      val n = toks.length
      val counts = toks.groupBy(identity).map { case (t, o) => t -> o.size }
      counts.filter(_._2 * 9 > n).keys.foreach { hot =>
        assert(merged.containsKey(hot),
          s"seed $i: item $hot with count ${counts(hot)} > N/9 (N=$n) missing")
      }
    }
  }
}
