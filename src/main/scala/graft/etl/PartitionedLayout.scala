package graft.etl

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A16: partitioned table layout + partition-pruned scans — the storage
  * lever that matters most at 100 TB: a scan filtered on the partition
  * column never opens the other partitions' files at all
  * (`PartitionFilters` in the plan, vs `PushedFilters` which still reads
  * row groups). The mirror analog: one directory per database/species,
  * so per-species queries touch one subtree.
  */
object PartitionedLayout {

  /** Write `df` hive-partitioned by `partCol` under `path`. */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** A16 query: lay the documents out partitioned by lang, then answer a
    * two-language rollup from the partitioned copy — the scan must prune
    * to the two lang= directories (asserted in PlanSpec). The oracle
    * computes the same rollup from the flat table, proving the layout
    * change is invisible to results.
    */
  def query(s: SparkSession, d: String): DataFrame = {
    val path = "/tmp/graft_partitioned_documents"
    writePartitioned(Tables.documents(s, d), path, "lang")
    prunedScan(s, path)
  }

  def prunedScan(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)
      .filter(col("lang").isin("en", "de"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("lang")
}
