package graft.relational

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz B17b's bracket-and-interpolate arithmetic against Spark's own
  * `percentile()` on arbitrary cents multisets: any group size (incl. 1
  * and 2), duplicate-heavy shapes, index exactly on a value boundary
  * ((n−1) divisible by the fraction denominator), values spanning sign
  * and magnitude. The two forms must agree bit-for-bit on every quarter
  * quantile (dyadic rationals) and on p90 to well under the 4dp round.
  */
class QuantileHistPropSpec extends AnyFunSuite {

  private val cents: Gen[Long] =
    Gen.frequency(
      3 -> Gen.choose(-500L, 500L),
      2 -> Gen.choose(-100000L, 100000L),
      1 -> Gen.oneOf(0L, 1L, -1L, 99L, 100L))

  private val group: Gen[List[Long]] = for {
    n <- Gen.frequency(2 -> Gen.const(1), 2 -> Gen.const(2), 2 -> Gen.const(5),
      1 -> Gen.const(11), 2 -> Gen.choose(3, 40))
    vs <- Gen.listOfN(n, cents)
    dupAll <- Gen.prob(0.2)
  } yield if (dupAll) List.fill(n)(vs.head) else vs

  test("histogram quantiles equal percentile() on arbitrary multisets") {
    val s = TestSpark.spark
    val sq = s; import sq.implicits._
    (1 to 10).foreach { seed =>
      val groups = Gen.listOfN(4, group)
        .apply(Gen.Parameters.default, Seed(seed.toLong)).get
      // qty leg: integer dollars (×100 cents) — quarter quantiles are then
      // dyadic rationals and must match percentile() BIT-exactly (this is
      // l_quantity's regime). price leg: arbitrary cents — the true value
      // is non-dyadic, engines differ in last ulps, assert to 1e-9 (the
      // oracle's round-to-4dp absorbs this; a wrong BRACKET would miss by
      // whole cents, which 1e-9 still catches).
      val rows = groups.zipWithIndex.flatMap { case (vs, gi) =>
        vs.map(v => (s"g$gi", v * 100, v * 3 - 7))
      }
      val base = rows.toDF("flag", "qty_c", "price_c")
      val hist = Relational.quantileHistOn(s, base)
        .orderBy("l_returnflag").collect()
      val ref = base
        .select(col("flag"), (col("qty_c").cast("double") / 100).as("qty"),
          (col("price_c").cast("double") / 100).as("price"))
        .groupBy("flag")
        .agg(percentile(col("qty"), lit(0.25)).as("qty_p25"),
          percentile(col("qty"), lit(0.5)).as("qty_p50"),
          percentile(col("qty"), lit(0.75)).as("qty_p75"),
          round(percentile(col("price"), lit(0.9)), 4).as("price_p90"))
        .orderBy("flag").collect()
      assert(hist.length == ref.length, s"seed $seed")
      hist.zip(ref).foreach { case (h, r) =>
        assert(h.getString(0) == r.getString(0), s"seed $seed")
        for (i <- 1 to 3)
          assert(h.getDouble(i) == r.getDouble(i),
            s"seed $seed ${h.getString(0)} qty col $i: " +
              s"${h.getDouble(i)} vs ${r.getDouble(i)} ($groups)")
        // percentile() rounds AFTER float interpolation; on a .xxxx5
        // boundary its round-to-4dp can land one 1e-4 step away from the
        // exact-rational round — allow one step plus float slack
        assert(math.abs(h.getDouble(4) - r.getDouble(4)) < 1.01e-4,
          s"seed $seed ${h.getString(0)} p90: " +
            s"${h.getDouble(4)} vs ${r.getDouble(4)} ($groups)")
      }
    }
  }
}
