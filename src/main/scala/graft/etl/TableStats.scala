package graft.etl

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A12: ANALYZE TABLE analog — per-column count / ndv / min / max.
  *
  * The reference runs `analyze table` after each load so MySQL has fresh
  * statistics (LoadFiles.pm:230-234). The Spark-native equivalent is ONE
  * multi-aggregate scan (count + per-column distinct/min/max computed
  * together, then unpivoted with stack) — at 100 TB this is a single pass
  * with partial aggregation, not a per-column rescan.
  */
object TableStats {

  /** Stats for a representative set of lineitem columns: numerics rendered
    * as fixed-scale decimals and timestamps as dates so both engines print
    * identical strings.
    */
  def query(s: SparkSession, d: String): DataFrame = {
    val dec: Column => Column = c => c.cast("decimal(18,4)").cast("string")
    val l = Tables.lineitem(s, d)
      .select("l_quantity", "l_extendedprice", "l_discount", "l_returnflag", "l_shipdate")
    l.agg(
        count(lit(1)).as("n"),
        countDistinct(col("l_quantity")).as("d_qty"),
        dec(min(col("l_quantity"))).as("mn_qty"), dec(max(col("l_quantity"))).as("mx_qty"),
        countDistinct(col("l_extendedprice")).as("d_ep"),
        dec(min(col("l_extendedprice"))).as("mn_ep"), dec(max(col("l_extendedprice"))).as("mx_ep"),
        countDistinct(col("l_discount")).as("d_disc"),
        dec(min(col("l_discount"))).as("mn_disc"), dec(max(col("l_discount"))).as("mx_disc"),
        countDistinct(col("l_returnflag")).as("d_flag"),
        min(col("l_returnflag")).as("mn_flag"), max(col("l_returnflag")).as("mx_flag"),
        countDistinct(col("l_shipdate")).as("d_ship"),
        date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("mn_ship"),
        date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("mx_ship"))
      .selectExpr(
        """stack(5,
           'l_quantity',      n, d_qty,  mn_qty,  mx_qty,
           'l_extendedprice', n, d_ep,   mn_ep,   mx_ep,
           'l_discount',      n, d_disc, mn_disc, mx_disc,
           'l_returnflag',    n, d_flag, mn_flag, mx_flag,
           'l_shipdate',      n, d_ship, mn_ship, mx_ship
           ) AS (col_name, n_rows, n_distinct, min_s, max_s)""")
      .orderBy("col_name")
  }
}
