package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong` (set in GraftSession) it
    * surfaces as a long which we floor-truncate to microseconds — the
    * same truncation DuckDB applies when casting ns→µs, so oracle
    * comparisons at second granularity agree.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = apply(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    else raw
  }
}
