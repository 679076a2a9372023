package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Central table catalog over a scale-factor directory.
  *
  * Every read in the engine goes through here so that column pruning and
  * filter pushdown are uniform: callers `.select(...)` immediately and
  * Catalyst prunes the parquet scan (verified in PlanSpec).
  *
  * Spark-first analog of the reference's catalog surface
  * (`SHOW DATABASES` hash in RunnableDB/Database.pm:55-62 and the dir
  * listings in RunnableDB/DatabaseFactory.pm:101-150).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** events.parquet has carried `ts` in three physical shapes across
    * testdata generations: TIMESTAMP(NANOS) (surfaced as long via
    * `spark.sql.legacy.parquet.nanosAsLong`, floor-truncated to µs here —
    * the same truncation DuckDB applies casting ns→µs), naive
    * TIMESTAMP(MICROS) (surfaced as TIMESTAMP_NTZ by the parquet NTZ
    * inference), and tz-adjusted micros (already TimestampType). All are
    * normalized to TimestampType: the session timezone is pinned to UTC
    * (GraftSession), so the NTZ→LTZ cast relabels the same wall-clock
    * instant and every downstream `unix_micros`/`date_format`/window
    * agrees with the DuckDB oracle's naive-timestamp reading.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
}
