package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The synthetic corpus passes every rule, so the oracle alone never
  * exercises the violation arithmetic — this spec feeds crafted bad
  * relations and pins each rule's count.
  */
class DataQualitySpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("each rule counts its violations on crafted bad data") {
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("dq").toString
    // rows: ok / qty 99 / discount 0.5 / tax -0.01 / null shipdate / orphan fk
    Seq(
      (1L, 10.0, 0.05, 0.04, Option("2024-01-01")),
      (1L, 99.0, 0.05, 0.04, Option("2024-01-01")),
      (1L, 10.0, 0.50, 0.04, Option("2024-01-01")),
      (1L, 10.0, 0.05, -0.01, Option("2024-01-01")),
      (1L, 10.0, 0.05, 0.04, None),
      (7L, 10.0, 0.05, 0.04, Option("2024-01-01")))
      .toDF("l_orderkey", "l_quantity", "l_discount", "l_tax", "l_shipdate")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    // dup pk 2, non-positive price, orphan custkey 99
    Seq((1L, 1L, 100.0), (2L, 1L, 0.0), (2L, 99L, 50.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    Seq(Tuple1(1L)).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")

    val got = DataQuality.audit(s, tmp).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got("lineitem.quantity_in_1_50") == ((6L, 1L, false)))
    assert(got("lineitem.discount_in_0_10pct") == ((6L, 1L, false)))
    assert(got("lineitem.tax_in_0_8pct") == ((6L, 1L, false)))
    assert(got("lineitem.shipdate_not_null") == ((6L, 1L, false)))
    assert(got("orders.pk_orderkey_unique") == ((3L, 1L, false)))
    assert(got("orders.totalprice_positive") == ((3L, 1L, false)))
    assert(got("lineitem.fk_orderkey_exists") == ((6L, 1L, false)))
    assert(got("orders.fk_custkey_exists") == ((3L, 1L, false)))
  }
}
