package graft.relational

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** B41–B49: the nine classic decision-support shapes (TPC-H Q4, Q6, Q9,
  * Q10, Q11, Q12, Q16, Q17, Q20) the B-inventory didn't cover yet —
  * adapted to this catalog's columns (no partsupp / shipmode / commit
  * dates in the driver's tables; each scaladoc states the substitution).
  * With these, every one of the 22 TPC-H query shapes has a
  * Spark-first, oracle-checked implementation in §2.
  *
  * House rules as everywhere in this package: money math in exact
  * fixed-point longs with partition-local partials merged through
  * decimal(38,0) (see q1Agg's overflow bound), filters stated on raw
  * columns so they reach the parquet scan as PushedFilters, bounded
  * dims broadcast, fact-fact joins left to shuffle + AQE.
  */
object TpchGaps {
  import Relational.{cents, revUnits, sumD38, unitsToDbl}

  /** B41 `q_forecast` (Q6 shape): the pure scan–filter–aggregate —
    * revenue delta if discounts in a band were dropped. All three
    * predicates are raw-column comparisons, so they reach the scan as
    * PushedFilters plus row-group min/max pruning; the product
    * ep·disc runs in exact 10⁻⁴ units.
    */
  def qForecast(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01")
        && col("l_discount") >= 0.05 && col("l_discount") <= 0.07
        && col("l_quantity") < 24)
      .select((cents(col("l_extendedprice")) * cents(col("l_discount"))).as("d_u"))
      .groupBy(spark_partition_id().as("pid")).agg(sum(col("d_u")).as("p_su"))
      .agg(sumD38(col("p_su")).as("su"))
      .select(unitsToDbl(col("su"), 10000).as("forecast_revenue"))

  val forecastOracleSql: String = """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
      AS forecast_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"""

  /** B42 `q_priority` (Q4 shape): order-priority checking — orders of a
    * quarter having at least one returned line (the catalog's stand-in
    * for Q4's commit<receipt lateness). The EXISTS is a LEFT SEMI join,
    * which dedups line multiplicity before the count ever sees it — no
    * DISTINCT pass; the date window prunes the orders scan.
    */
  def qPriority(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1996-04-01"))
      .select("o_orderkey", "o_orderpriority")
    val returned = Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R").select("l_orderkey")
    o.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val priorityOracleSql: String = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** B43 `q_returns` (Q10 shape): top-20 customers by revenue lost to
    * returns in a quarter. The fact–fact join shuffles on the order key;
    * aggregation lands on the customer key BEFORE the customer/nation
    * dims join (the join input is ≤ one row per customer, never line
    * grain), and the top-20 is TakeOrderedAndProject on the exact
    * integer revenue with the key as tiebreak — deterministic, no float
    * ranking.
    */
  def qReturns(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1995-01-01") && col("o_orderdate") < lit("1995-04-01"))
      .select("o_orderkey", "o_custkey")
    val rev = Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), revUnits().as("rev_u"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), spark_partition_id().as("pid"))
      .agg(sum(col("rev_u")).as("p_su"))
      .groupBy("o_custkey").agg(sumD38(col("p_su")).as("rev_su"))
    rev.join(Tables.customer(s, d).select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        dec(col("c_acctbal"), 9, 2).cast("double").as("c_acctbal"),
        unitsToDbl(col("rev_su"), 10000).as("revenue"),
        col("rev_su"))
      .orderBy(col("rev_su").desc, col("c_custkey"))
      .limit(20)
      .drop("rev_su")
  }

  private def dec(c: org.apache.spark.sql.Column, p: Int, sc: Int) = Relational.dec(c, p, sc)

  val returnsOracleSql: String = """
    SELECT c_custkey, c_name, n_name,
      CAST(CAST(c_acctbal AS DECIMAL(9,2)) AS DOUBLE) AS c_acctbal,
      CAST(rev AS DOUBLE) AS revenue
    FROM (
      SELECT o_custkey,
        sum(CAST(l_extendedprice AS DECIMAL(9,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS rev
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-04-01'
      GROUP BY o_custkey) r
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    ORDER BY rev DESC, c_custkey LIMIT 20"""

  /** B44 `q_profit` (Q9 shape): product-line profit by nation and order
    * year. No partsupp here, so cost is the catalog's stand-in
    * retailprice·qty/2 — the SHAPE is Q9's: a line-grain star join
    * (part filtered by name, supplier→nation, orders for the year) with
    * the profit measure summed per (nation, year). The name-filtered
    * part (~5%) and nation broadcast; lineitem–orders shuffles on the
    * order key. Profit per row is an exact 10⁻⁴-unit long
    * (rev − cents(rp)·qty·50).
    */
  def qProfit(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d).filter(col("p_name").startsWith("blue"))
      .select(col("p_partkey"), cents(col("p_retailprice")).as("rp_c"))
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    val n = Tables.nation(s, d).select("n_nationkey", "n_name")
    val o = Tables.orders(s, d).select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        revUnits().as("rev_u"), col("l_quantity").cast("long").as("qty"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("n_name"), col("o_year"),
        (col("rev_u") - col("rp_c") * col("qty") * 50).as("profit_u"))
      .groupBy(col("n_name"), col("o_year"), spark_partition_id().as("pid"))
      .agg(sum(col("profit_u")).as("p_su"))
      .groupBy("n_name", "o_year").agg(sumD38(col("p_su")).as("su"))
      .select(col("n_name"), col("o_year"), unitsToDbl(col("su"), 10000).as("profit"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  val profitOracleSql: String = """
    SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
        - CAST(p_retailprice AS DECIMAL(9,2)) * CAST(l_quantity AS BIGINT) * CAST(0.5 AS DECIMAL(2,1))) AS DOUBLE)
        AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE 'blue%'
    GROUP BY n_name, year(o_orderdate)
    ORDER BY n_name, o_year DESC"""

  /** B45 `q_important` (Q11 shape): parts whose shipped value through one
    * nation's suppliers exceeds 1/1000 of that nation's total — the
    * group-share-above-global-fraction pattern. The total is a 1-row
    * broadcast scalar; the gate compares exact integers
    * (1000·value > total), so no float threshold wobble, and the
    * per-part frame is aggregated once and reused for both sides.
    */
  def qImportant(s: SparkSession, d: String, stage: Boolean = true): DataFrame = {
    val sup = Tables.supplier(s, d).filter(col("s_nationkey") === 3).select("s_suppkey")
    val valuePlan = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"), revUnits().as("rev_u"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"), spark_partition_id().as("pid"))
      .agg(sum(col("rev_u")).as("p_su"))
      .groupBy("l_partkey").agg(sumD38(col("p_su")).as("val_su"))
    // consumed by the total and the gate; stage=false keeps the full plan
    // visible for PlanDoc/AllPlansSpec
    val value = if (stage) valuePlan.localCheckpoint() else valuePlan
    val total = value.agg(sum(col("val_su")).as("total_su"))
    value.crossJoin(broadcast(total))
      .filter(col("val_su") * 1000 > col("total_su"))
      .select(col("l_partkey").as("p_partkey"), unitsToDbl(col("val_su"), 10000).as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  val importantOracleSql: String = """
    WITH v AS (
      SELECT l_partkey AS p_partkey,
        sum(CAST(l_extendedprice AS DECIMAL(9,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS val
      FROM lineitem
      WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey = 3)
      GROUP BY l_partkey)
    SELECT p_partkey, CAST(val AS DOUBLE) AS value
    FROM v WHERE val * 1000 > (SELECT sum(val) FROM v)
    ORDER BY value DESC, p_partkey"""

  /** B46 `q_shipmode` (Q12 shape): late-shipment accounting by mode —
    * here "mode" is the line status and "late" is shipping >90 days
    * after the order date (this catalog has no shipmode/commit/receipt
    * columns). The orders join shuffles on the key; priority classes
    * collapse into two conditional sums, one pass.
    */
  def qShipmode(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select("o_orderkey", "o_orderdate", "o_orderpriority")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01"))
      .select("l_orderkey", "l_linestatus", "l_shipdate")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(col("l_linestatus").as("mode"))
      .agg(sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("low_line_count"))
      .orderBy("mode")
  }

  val shipmodeOracleSql: String = """
    SELECT l_linestatus AS mode,
      CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
        AS high_line_count,
      CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
        AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY l_linestatus ORDER BY mode"""

  /** B47 `q_suppcnt` (Q16 shape): how many distinct suppliers ship each
    * (type, size) product class, excluding a supplier blacklist (Q16's
    * complaints filter, here key-derived). The blacklist is a LEFT ANTI
    * join BEFORE aggregation; the distinct count shuffles once on the
    * group key with partial-distinct map-side dedup.
    */
  def qSuppcnt(s: SparkSession, d: String): DataFrame = {
    val black = Tables.supplier(s, d).filter(col("s_suppkey") % 10 === 0).select("s_suppkey")
    val p = Tables.part(s, d).select("p_partkey", "p_type", "p_size")
    Tables.lineitem(s, d).select("l_partkey", "l_suppkey")
      .join(broadcast(black), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"), col("p_size").cast("long").as("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_type"), col("p_size"))
  }

  val suppcntOracleSql: String = """
    SELECT p_type, CAST(p_size AS BIGINT) AS p_size,
      CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 10 = 0)
    GROUP BY p_type, p_size
    ORDER BY supplier_cnt DESC, p_type, p_size"""

  /** B48 `q_smallqty` (Q17 shape): revenue from small-quantity lines of
    * one brand's parts — the correlated per-part average. The per-part
    * threshold aggregates the FULL lineitem once (grouped on the part
    * key), then joins back; the below-half-average gate is exact
    * integer cross-multiplication (2·qty·n < Σqty), never a float avg.
    */
  def qSmallqty(s: SparkSession, d: String): DataFrame = {
    val brand = Tables.part(s, d).filter(col("p_brand") === "Brand#11").select("p_partkey")
    // partkey determines brand, so semi-filtering BEFORE the threshold
    // aggregate keeps every line of every brand part — result-identical
    // to aggregating all parts, but the agg and join run on the ~0.3%
    // sliver instead of the full fact (tpch_gaps_10x: 8.4 s → measured
    // again after this change in BASELINE.md)
    val li = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        cents(col("l_extendedprice")).as("ep_c"))
      .join(broadcast(brand), col("l_partkey") === col("p_partkey"), "left_semi")
    val th = li.groupBy("l_partkey")
      .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("n_li"))
    li.join(th, Seq("l_partkey")) // th is #brand-parts rows; AQE broadcasts it
      .filter(col("qty") * 2 * col("n_li") < col("sum_qty"))
      .groupBy(spark_partition_id().as("pid")).agg(sum(col("ep_c")).as("p_su"))
      .agg(sumD38(col("p_su")).as("su"))
      .select((unitsToDbl(col("su"), 100) / 7.0).as("avg_yearly"))
  }

  val smallqtyOracleSql: String = """
    WITH th AS (
      SELECT l_partkey, sum(CAST(l_quantity AS BIGINT)) AS sum_qty, count(*) AS n_li
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem JOIN th USING (l_partkey)
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#11')
      AND CAST(l_quantity AS BIGINT) * 2 * n_li < sum_qty"""

  /** B49 `q_excess` (Q20 shape): suppliers who shipped more than half of
    * some name-filtered part's yearly volume — the nested
    * quantity-threshold subquery. Both aggregates come out of ONE
    * lineitem scan grouped at (part, supplier) grain: the part total is
    * a second aggregate over the same frame, joined back at part grain
    * (dozens of rows per part, not line grain), then the qualifying
    * pairs semi-join supplier/nation dims.
    */
  def qExcess(s: SparkSession, d: String, stage: Boolean = true): DataFrame = {
    val blue = Tables.part(s, d).filter(col("p_name").startsWith("blue")).select("p_partkey")
    val spPlan = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01"))
      .join(broadcast(blue), col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity").cast("long").as("qty"))
      .groupBy("l_partkey", "l_suppkey").agg(sum(col("qty")).as("supp_qty"))
    // reused: part totals + the gate; stage=false for plan inspection
    val sp = if (stage) spPlan.localCheckpoint() else spPlan
    val tot = sp.groupBy("l_partkey").agg(sum(col("supp_qty")).as("part_qty"))
    val qualifying = sp.join(tot, Seq("l_partkey"))
      .filter(col("supp_qty") * 2 > col("part_qty"))
      .select("l_suppkey").distinct()
    Tables.supplier(s, d).select("s_suppkey", "s_name", "s_nationkey")
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy("s_suppkey")
  }

  val excessOracleSql: String = """
    WITH sp AS (
      SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS BIGINT)) AS supp_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%')
      GROUP BY l_partkey, l_suppkey),
    tot AS (SELECT l_partkey, sum(supp_qty) AS part_qty FROM sp GROUP BY l_partkey)
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM sp JOIN tot USING (l_partkey) WHERE supp_qty * 2 > part_qty)
    ORDER BY s_suppkey"""
}
