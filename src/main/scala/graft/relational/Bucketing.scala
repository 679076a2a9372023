package graft.relational

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** B19: bucketed co-located joins — the §4 answer to "is there a shuffle
  * here that becomes the bottleneck at scale?".
  *
  * Fact tables that join repeatedly on the same key (lineitem⋈orders on
  * orderkey) are written bucketed+sorted by that key once; every later
  * join reads both sides pre-partitioned and pre-sorted, so Catalyst
  * plans a SortMergeJoin with NO Exchange and NO Sort — at 100 TB that
  * removes the dominant shuffle of the workload. Verified by
  * BucketingSpec (asserts the join plan is exchange-free).
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table (parquet, in-catalog). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — shuffle-free when both
    * were written with the same bucket count on `key`.
    */
  def coLocatedJoin(s: SparkSession, left: String, right: String, key: String): DataFrame =
    s.table(left).join(s.table(right), key)

  /** Drop a managed table AND its warehouse location: the location
    * survives the session (the in-memory catalog does not), so a fresh
    * session's saveAsTable would otherwise hit LOCATION_ALREADY_EXISTS.
    */
  def reset(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    val loc = new java.io.File(wh, table)
    if (loc.exists()) rm(loc)
  }

  /** B19 query (r5, oracle-checked): bucket-write both fact sides on the
    * join key, then aggregate over the co-located join. The RESULT is
    * what the oracle hashes (identical to the plain shuffled join); the
    * exchange-free PLAN is asserted in BucketingSpec. Managed tables land
    * in spark-warehouse/ (gitignored); rewritten idempotently per run.
    */
  def query(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("k"), col("l_quantity").cast(DecimalType(8, 2)).as("qty"))
    val o = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_orderstatus"))
    // per-application table names: the managed-table location lives in the
    // SHARED warehouse dir, so two concurrent sessions writing the same
    // table name would race on the same directory (VERDICT r6 #8)
    val tag = s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9_]", "_")
    val (liT, oT) = (s"graft_li_bucketed_$tag", s"graft_o_bucketed_$tag")
    Seq(liT, oT).foreach(reset(s, _))
    writeBucketed(li, liT, "k")
    writeBucketed(o, oT, "k")
    coLocatedJoin(s, liT, oT, "k")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_lines"), sum("qty").as("sum_qty"))
      .orderBy("o_orderstatus")
  }
}
