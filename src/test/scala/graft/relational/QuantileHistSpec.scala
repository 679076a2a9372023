package graft.relational

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** B17b contract: the histogram form is the sort-based percentile, at
  * distinct-value cost — identical output, and no corpus-sized sort.
  */
class QuantileHistSpec extends AnyFunSuite {

  test("histogram quantiles equal the sort-based percentile() exactly") {
    val s = TestSpark.spark
    val sortBased = Relational.qPercentile(s, TestSpark.sf).collect()
    val histBased = Relational.qQuantileHist(s, TestSpark.sf).collect()
    assert(histBased.length == sortBased.length && histBased.length > 0)
    sortBased.zip(histBased).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      // qty quantiles at quarter fractions over integer values are dyadic
      // rationals: both engines must produce them BIT-exactly.
      for (i <- 1 to 3) assert(a.getDouble(i) == b.getDouble(i),
        s"${a.getString(0)} col $i: ${a.getDouble(i)} vs ${b.getDouble(i)}")
      assert(a.getDouble(4) == b.getDouble(4),
        s"${a.getString(0)} p90: ${a.getDouble(4)} vs ${b.getDouble(4)}")
    }
  }

  test("only the histogram is sorted — every Sort sits above the value-count aggregate") {
    val s = TestSpark.spark
    val plan = Relational.qQuantileHist(s, TestSpark.sf)
      .queryExecution.executedPlan.toString
    // The corpus-side shuffle must be the partial-count aggregate on
    // (flag, metric, v) — i.e. a HashAggregate appears below the first
    // Exchange, and no Sort node reads the FileScan directly.
    val lines = plan.linesIterator.toIndexedSeq
    val scanIdx = lines.indexWhere(_.contains("FileScan"))
    assert(scanIdx >= 0)
    val betweenScanAndFirstExchange =
      lines.take(scanIdx).reverse.takeWhile(!_.contains("Exchange"))
    assert(betweenScanAndFirstExchange.exists(_.contains("HashAggregate")),
      s"no map-side combine above the scan:\n$plan")
    assert(!betweenScanAndFirstExchange.exists(_.contains("Sort")),
      s"corpus-side sort found:\n$plan")
  }
}
