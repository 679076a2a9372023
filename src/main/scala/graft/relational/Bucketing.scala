package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
