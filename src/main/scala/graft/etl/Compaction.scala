package graft.etl

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A23: small-file compaction planning.
  *
  * The reference ships every table as many `.txt.gz` parts and loads them
  * part-by-part (LoadFiles.pm:187-216); at warehouse scale the analogous
  * problem is the small-file problem — a crawl drop lands as millions of
  * KB-sized objects and every downstream scan pays per-file open cost.
  * The compactor's plan is pure metadata arithmetic: order each source's
  * files, take the exclusive prefix sum of their sizes, and assign
  * `cgroup = cum_before DIV target` — byte-offset sharding, the same rule
  * Spark's own `FilePartition` planner uses for `maxPartitionBytes`, so a
  * group can exceed the target only by the tail of its last file.
  *
  * Scale shape: the input is the file LISTING (one row per file — metadata,
  * not data; millions of rows at 100 TB), the window partitions by source
  * so no single task orders the whole listing, and the output is
  * group-grained. The actual rewrite is then an embarrassingly parallel
  * per-group concat that never shuffles row data at all.
  */
object Compaction {

  /** Listing granularity for the derived test listing (files per source). */
  val FilesPerSource = 64L

  /** Compaction target in bytes (test-scale; a real run uses 128–512 MB). */
  val TargetBytes = 4096L

  /** Derived deterministic listing: documents fold into per-source file
    * buckets; `bytes` is the text payload size the compactor bins on.
    */
  def fileListing(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("source"), (col("doc_id") % FilesPerSource).as("file_seq"))
      .agg(sum("n_chars").as("bytes"), count(lit(1)).as("n_docs"))

  /** The compaction plan over an arbitrary (source, file_seq, bytes,
    * n_docs) listing — exposed separately so a real listing drops in.
    */
  def planOn(files: DataFrame, target: Long): DataFrame = {
    val before = Window.partitionBy("source").orderBy("file_seq")
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("cum_before", coalesce(sum("bytes").over(before), lit(0L)))
      .withColumn("cgroup", expr(s"cum_before DIV $target"))
      .groupBy("source", "cgroup")
      .agg(count(lit(1)).as("n_files"), sum("bytes").as("grp_bytes"),
        sum("n_docs").as("n_docs"),
        min("file_seq").as("first_seq"), max("file_seq").as("last_seq"),
        max((col("bytes") >= target).cast("long")).as("has_oversize"))
      .orderBy("source", "cgroup")
  }

  def query(s: SparkSession, d: String): DataFrame =
    planOn(fileListing(s, d), TargetBytes)

  val oracleSql: String = s"""
    SELECT source, CAST(cum_before // $TargetBytes AS BIGINT) AS cgroup,
      count(*) AS n_files, CAST(sum(bytes) AS BIGINT) AS grp_bytes,
      CAST(sum(n_docs) AS BIGINT) AS n_docs,
      min(file_seq) AS first_seq, max(file_seq) AS last_seq,
      max(CASE WHEN bytes >= $TargetBytes THEN 1 ELSE 0 END) AS has_oversize
    FROM (
      SELECT source, file_seq, bytes, n_docs,
        coalesce(sum(bytes) OVER (PARTITION BY source ORDER BY file_seq
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM (
        SELECT source, doc_id % $FilesPerSource AS file_seq,
          CAST(sum(n_chars) AS BIGINT) AS bytes, count(*) AS n_docs
        FROM documents GROUP BY 1, 2) listing) t
    GROUP BY 1, 2 ORDER BY 1, 2"""
}
