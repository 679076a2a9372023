package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Drives the Misra-Gries aggregate's update/merge/serialize directly —
  * the r8 boxing regression (scala.Long values made `cur != null` always
  * true, so the decrement branch never fired and buffers grew unbounded)
  * passed every end-to-end oracle because an unbounded buffer is still a
  * candidate superset; only the buffer SIZE betrays it. Pin it here.
  */
class FrequentItemsSpec extends AnyFunSuite {

  private def row(s: String): InternalRow = InternalRow(UTF8String.fromString(s))
  private def sketch(k: Int) = FrequentItemsSketch(BoundReference(0, StringType, nullable = true), k)

  test("buffer never exceeds k entries on an all-distinct stream") {
    val agg = sketch(8)
    val b = agg.createAggregationBuffer()
    (1 to 10000).foreach(i => agg.update(b, row(s"tok$i")))
    assert(b.size <= 8, s"MG buffer must stay ≤ k, got ${b.size}")
    assert(agg.serialize(b).length < 8 * 64, "partial buffers must ship bytes, not the vocabulary")
  }

  test("an item above N/(k+1) share survives any single-buffer stream") {
    val agg = sketch(8)
    val b = agg.createAggregationBuffer()
    // 3000 hot + 6000 distinct rares interleaved: hot share 1/3 > 1/9
    (1 to 3000).foreach { i =>
      agg.update(b, row("hot"))
      agg.update(b, row(s"rareA$i")); agg.update(b, row(s"rareB$i"))
    }
    assert(b.containsKey("hot"), "guaranteed heavy hitter must be present")
  }

  test("merge keeps the cap and the guarantee across buffers") {
    val agg = sketch(8)
    val parts = (0 until 4).map { p =>
      val b = agg.createAggregationBuffer()
      (1 to 1000).foreach { i =>
        agg.update(b, row("hot"))
        agg.update(b, row(s"rare${p}x$i"))
      }
      b
    }
    val merged = parts.reduce((a, c) => agg.merge(a, agg.deserialize(agg.serialize(c))))
    assert(merged.size <= 8, s"merged buffer must stay ≤ k, got ${merged.size}")
    assert(merged.containsKey("hot"))
  }
}
