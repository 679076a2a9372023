package graft.relational

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** B33: Z-order (Morton-curve) layout audit — multi-dimensional data
  * skipping. A single-column sort clusters ONE predicate dimension;
  * file-level min/max stats on the other dimension stay full-range and
  * prune nothing. Interleaving the bits of both keys (the Z-curve) makes
  * every contiguous byte range a small rectangle in (dim1, dim2) space,
  * so zone-map pruning works for BOTH dimensions at once — the layout
  * trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`, expressed here as
  * pure integer arithmetic Catalyst codegens.
  *
  * Keys are first scale-normalized to 16 bits via a 1-row broadcast max
  * (`(k·65536) DIV (max+1)` — exact integers, SF-independent), then
  * spread with the classic mask ladder and interleaved; the audit groups
  * rows into 64 Z-range buckets (= files at scale) and reports each
  * bucket's min/max per dimension — the zone map a reader would prune
  * with. ZOrderSpec quantifies the claim: per-bucket ranges stay narrow
  * in BOTH dims, where a one-dim sort leaves the other dim full-range.
  *
  * Shape at 100 TB: the z key is one codegen'd projection (no join, no
  * extra pass); writing `repartitionByRange(z)` + sortWithinPartitions(z)
  * then lands the curve order physically — the audit itself is one
  * map-side-combined aggregate.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to even bit positions (Morton ladder). */
  def spread16(c: Column): Column = {
    val a = c.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val d = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x33333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit values. */
  def morton(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  def query(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select("l_partkey", "l_suppkey")
    val maxes = li.agg(max("l_partkey").as("max_pk"), max("l_suppkey").as("max_sk"))
    li.crossJoin(broadcast(maxes))
      // BIGINT before the ×65536: an int partkey overflows 32 bits past ~sf0.2.
      .withColumn("npk", expr("CAST(l_partkey AS BIGINT) * 65536 DIV (max_pk + 1)"))
      .withColumn("nsk", expr("CAST(l_suppkey AS BIGINT) * 65536 DIV (max_sk + 1)"))
      .withColumn("z", morton(col("npk"), col("nsk")))
      .withColumn("zbucket", expr("z DIV 67108864")) // 2^26 → 64 buckets
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n"),
        min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"),
        min("l_suppkey").as("min_sk"), max("l_suppkey").as("max_sk"))
      .orderBy("zbucket")
  }

  val oracleSql: String = """
    WITH m AS (SELECT max(l_partkey) AS mpk, max(l_suppkey) AS msk FROM lineitem),
    n AS (SELECT l_partkey, l_suppkey,
        CAST(l_partkey AS BIGINT) * 65536 // (mpk + 1) AS npk,
        CAST(l_suppkey AS BIGINT) * 65536 // (msk + 1) AS nsk
      FROM lineitem, m),
    s1 AS (SELECT l_partkey, l_suppkey,
        ((npk | (npk << 8)) & 16711935) AS px1,
        ((nsk | (nsk << 8)) & 16711935) AS sx1 FROM n),
    s2 AS (SELECT l_partkey, l_suppkey,
        ((px1 | (px1 << 4)) & 252645135) AS px2,
        ((sx1 | (sx1 << 4)) & 252645135) AS sx2 FROM s1),
    s3 AS (SELECT l_partkey, l_suppkey,
        ((px2 | (px2 << 2)) & 858993459) AS px3,
        ((sx2 | (sx2 << 2)) & 858993459) AS sx3 FROM s2),
    s4 AS (SELECT l_partkey, l_suppkey,
        ((px3 | (px3 << 1)) & 1431655765) AS px4,
        ((sx3 | (sx3 << 1)) & 1431655765) AS sx4 FROM s3),
    z AS (SELECT l_partkey, l_suppkey,
        (px4 | (sx4 << 1)) // 67108864 AS zbucket FROM s4)
    SELECT zbucket, count(*) AS n,
      min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
      min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk
    FROM z GROUP BY zbucket ORDER BY zbucket"""
}
