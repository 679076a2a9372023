package graft.relational

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B33: the Morton-curve layout audit. Two claims:
  *
  *  1. `ZOrder.morton` is a true bit interleave (checked against a
  *     per-bit reference on a grid of 16-bit corner/odd values).
  *  2. The layout claim itself, quantified on lineitem: Z-range buckets
  *     keep BOTH dimensions' per-bucket min/max ranges narrow, whereas a
  *     one-dimensional sort on partkey leaves the suppkey zone maps
  *     full-range (so a suppkey predicate prunes nothing).
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("morton matches a per-bit interleave reference") {
    import s.implicits._
    def ref(x: Long, y: Long): Long = {
      var z = 0L
      var i = 0
      while (i < 16) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }
    val vals = Seq(0L, 1L, 2L, 3L, 255L, 256L, 4095L, 12345L, 40000L, 65535L)
    val rows = vals.flatMap(x => vals.map(y => (x, y))).toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.morton(col("x"), col("y")).as("z"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1)),
        s"morton(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("z buckets prune both dims; partkey-sort buckets leave suppkey full-range") {
    val audit = ZOrder.query(s, TestSpark.sf).cache()
    try {
      val nBuckets = audit.count()
      assert(nBuckets > 1 && nBuckets <= 64, s"bucket count $nBuckets")

      // Mean per-bucket suppkey width under the Z layout.
      val zSk = audit.agg(avg(col("max_sk") - col("min_sk"))).head().getDouble(0)

      // Same 64-way split, but laid out by a partkey-only sort: bucket =
      // normalized partkey's top 6 bits. Every bucket then sees ~all suppkeys.
      val li = graft.Tables.lineitem(s, TestSpark.sf).select("l_partkey", "l_suppkey")
      val maxes = li.agg(max("l_partkey").as("max_pk"))
      val oneDim = li.crossJoin(broadcast(maxes))
        .withColumn("b", expr("(CAST(l_partkey AS BIGINT) * 64) DIV (max_pk + 1)"))
        .groupBy("b")
        .agg((max("l_suppkey") - min("l_suppkey")).as("w"))
      val sortSk = oneDim.agg(avg("w")).head().getDouble(0)

      // The Z layout's suppkey zone maps must be materially narrower than the
      // one-dim sort's (which approximates the full suppkey range per bucket).
      assert(zSk < sortSk / 2.0,
        s"z avg suppkey width $zSk not < half of one-dim sort's $sortSk")

      // And partkey stays narrow too: 64 buckets = 3 high bits per dim, so a
      // bucket spans at most ~1/8th of the partkey domain (×2 slack).
      val maxPk = li.agg(max("l_partkey").cast("long")).head().getLong(0)
      val zPkMax = audit.agg(max(col("max_pk") - col("min_pk")).cast("long")).head().getLong(0)
      assert(zPkMax <= maxPk / 4,
        s"z max partkey width $zPkMax exceeds a quarter of domain $maxPk")
    } finally audit.unpersist()
  }
}
