package graft.etl

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A27: declarative data-quality audit — the relational-level sequel to
  * A5/A6's file-level verification (Checksums.pm verifies the bytes
  * arrived; nothing in the reference verifies the LOADED RELATIONS make
  * sense — the gap every warehouse fills with a Deequ/dbt-test pass
  * after load). One audit run evaluates a rule set over the fact tables
  * and emits one row per rule: (rule, n_checked, n_violations, passed).
  *
  * Shape at 100 TB: every per-row rule over a table folds into ONE
  * map-side-combinable aggregate pass (a rule is a `sum(when(violated,
  * 1))` column — adding rules adds agg columns, never scans); primary-key
  * uniqueness rides the same pass as count − approx-free countDistinct;
  * the two referential rules are left-anti hash joins that shuffle only
  * the key columns. No rule ever collects rows — violation EXAMPLES are
  * a debugging query, not the audit.
  */
object DataQuality {

  def audit(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select("l_orderkey", "l_quantity", "l_discount", "l_tax", "l_shipdate")
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(s, d).select("c_custkey")

    val liRules = li.agg(
      count(lit(1)).as("n"),
      sum(when(col("l_quantity").between(1, 50), 0).otherwise(1)).as("v_qty"),
      sum(when(col("l_discount").cast("decimal(4,2)").between(0, 0.10), 0).otherwise(1)).as("v_disc"),
      sum(when(col("l_tax").cast("decimal(4,2)").between(0, 0.08), 0).otherwise(1)).as("v_tax"),
      sum(when(col("l_shipdate").isNull, 1).otherwise(0)).as("v_ship"))
      .selectExpr("""stack(4,
        'lineitem.quantity_in_1_50', n, v_qty,
        'lineitem.discount_in_0_10pct', n, v_disc,
        'lineitem.tax_in_0_8pct', n, v_tax,
        'lineitem.shipdate_not_null', n, v_ship) AS (rule, n_checked, n_violations)""")

    val oRules = o.agg(
      count(lit(1)).as("n"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_pk"),
      sum(when(col("o_totalprice") > 0, 0).otherwise(1)).as("v_price"))
      .selectExpr("""stack(2,
        'orders.pk_orderkey_unique', n, v_pk,
        'orders.totalprice_positive', n, v_price) AS (rule, n_checked, n_violations)""")

    // referential rules: anti-join survivors ARE the violations; the
    // count aggregates to one row even when zero rows survive
    val liOrphans = li.select("l_orderkey")
      .join(o.select("o_orderkey"), col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
      .crossJoin(li.agg(count(lit(1)).as("n")))
      .selectExpr("'lineitem.fk_orderkey_exists' AS rule",
        "n AS n_checked", "v AS n_violations")
    val oOrphans = o.select("o_custkey")
      .join(c, col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
      .crossJoin(o.agg(count(lit(1)).as("n")))
      .selectExpr("'orders.fk_custkey_exists' AS rule",
        "n AS n_checked", "v AS n_violations")

    liRules.unionByName(oRules).unionByName(liOrphans).unionByName(oOrphans)
      .select(col("rule"), col("n_checked").cast("long").as("n_checked"),
        col("n_violations").cast("long").as("n_violations"),
        (col("n_violations") === 0).as("passed"))
      .orderBy("rule")
  }

  val auditOracleSql: String = """
    WITH li AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END) AS BIGINT) AS v_qty,
        CAST(sum(CASE WHEN CAST(l_discount AS DECIMAL(4,2)) BETWEEN 0 AND 0.10 THEN 0 ELSE 1 END) AS BIGINT) AS v_disc,
        CAST(sum(CASE WHEN CAST(l_tax AS DECIMAL(4,2)) BETWEEN 0 AND 0.08 THEN 0 ELSE 1 END) AS BIGINT) AS v_tax,
        CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_ship
      FROM lineitem),
    o AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS v_pk,
        CAST(sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT) AS v_price
      FROM orders),
    liorph AS (SELECT CAST(count(*) AS BIGINT) AS v FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders oo WHERE oo.o_orderkey = l.l_orderkey)),
    oorph AS (SELECT CAST(count(*) AS BIGINT) AS v FROM orders oo
      WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = oo.o_custkey)),
    rules AS (
      SELECT 'lineitem.quantity_in_1_50' AS rule, n AS n_checked, v_qty AS n_violations FROM li
      UNION ALL SELECT 'lineitem.discount_in_0_10pct', n, v_disc FROM li
      UNION ALL SELECT 'lineitem.tax_in_0_8pct', n, v_tax FROM li
      UNION ALL SELECT 'lineitem.shipdate_not_null', n, v_ship FROM li
      UNION ALL SELECT 'orders.pk_orderkey_unique', n, v_pk FROM o
      UNION ALL SELECT 'orders.totalprice_positive', n, v_price FROM o
      UNION ALL SELECT 'lineitem.fk_orderkey_exists', (SELECT n FROM li), v FROM liorph
      UNION ALL SELECT 'orders.fk_custkey_exists', (SELECT n FROM o), v FROM oorph)
    SELECT rule, n_checked, n_violations, n_violations = 0 AS passed
    FROM rules ORDER BY rule"""
}
