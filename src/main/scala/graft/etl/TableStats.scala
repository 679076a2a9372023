package graft.etl

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A12: ANALYZE TABLE analog — per-column count / ndv / min / max.
  *
  * The reference runs `analyze table` after each load so MySQL has fresh
  * statistics (LoadFiles.pm:230-234). The Spark-native equivalent is a
  * single multi-aggregate pass producing the stats a cost-based optimizer
  * (or a human) wants; at 100 TB this is one scan with partial aggregation,
  * not a per-column rescan.
  */
object TableStats {

  private def statRow(df: DataFrame, colName: String, minMax: Column => Column): DataFrame =
    df.agg(
      lit(colName).as("col_name"),
      count(lit(1)).as("n_rows"),
      countDistinct(col(colName)).as("n_distinct"),
      minMax(min(col(colName))).cast("string").as("min_s"),
      minMax(max(col(colName))).cast("string").as("max_s"))
      .select("col_name", "n_rows", "n_distinct", "min_s", "max_s")

  /** Stats for a representative set of lineitem columns: numerics rendered
    * as fixed-scale decimals and timestamps as dates so both engines print
    * identical strings.
    */
  def query(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
      .select("l_quantity", "l_extendedprice", "l_discount", "l_returnflag", "l_shipdate")
    val asDec: Column => Column = c => c.cast("decimal(18,4)")
    val asDate: Column => Column = c => date_format(c, "yyyy-MM-dd")
    val ident: Column => Column = identity
    statRow(l, "l_quantity", asDec)
      .unionByName(statRow(l, "l_extendedprice", asDec))
      .unionByName(statRow(l, "l_discount", asDec))
      .unionByName(statRow(l, "l_returnflag", ident))
      .unionByName(statRow(l, "l_shipdate", asDate))
      .orderBy("col_name")
  }
}
