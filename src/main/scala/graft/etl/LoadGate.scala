package graft.etl

import graft.Tables
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-application scratch root so side-effecting operators from two
  * concurrent sessions never collide (applicationId is unique per Spark
  * app, local or cluster).
  */
object SessionPaths {
  def scratch(s: SparkSession, name: String): String =
    s"/tmp/graft_${s.sparkContext.applicationId}/$name"
}

/** A18: the loader's idempotent-reload gate (RunnableDB/LoadFiles.pm:56-64):
  * on the FIRST attempt an already-existing target database is an error —
  * the job throws rather than silently clobbering someone's data; on a
  * RETRY (retry_count > 0) the half-loaded leftover is dropped and the
  * load runs fresh. The contract that matters: overwrite-on-retry is
  * indistinguishable from a clean first load.
  *
  * Spark-native re-expression: the "database" is a parquet mirror
  * directory; exists/drop go through the Hadoop FileSystem API (portable
  * to HDFS/S3A — no local-path assumptions), and the load itself is an
  * ErrorIfExists parquet write so even a race between two loaders cannot
  * double-write. Driver-side work is only the existence check and the
  * directory delete; the data path stays fully distributed.
  */
object LoadGate {

  /** LoadFiles.pm:56-64, re-expressed. Throws on first-attempt collision;
    * drops and reloads on retry.
    *
    * Concurrency contract: the exists()/write pair is a driver-side
    * TOCTOU — two concurrent FIRST-attempt loaders can both observe
    * exists()==false; the ErrorIfExists write narrows but does not close
    * the race on non-atomic-rename filesystems (S3A). That matches the
    * reference (one eHive worker owns one database) and the single-driver
    * Verify/Bench use here. A multi-writer deployment must take a lease
    * first (atomic marker-file create, `fs.create(lockPath,
    * overwrite=false)`) and treat the lease holder as the sole loader.
    */
  def load(df: DataFrame, path: String, retryCount: Int): Unit = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    if (fs.exists(hPath)) {
      if (retryCount == 0)
        throw new IllegalStateException(
          s"Cannot continue. The database '$path' already exists and we are on our first attempt at loading")
      fs.delete(hPath, true)
    }
    df.write.parquet(path) // ErrorIfExists: a concurrent loader fails loudly
  }

  /** A18 query: plant a stale half-loaded mirror (an aborted earlier run),
    * prove the first attempt throws, retry-drop-and-reload, and answer an
    * aggregate from the reloaded mirror. The oracle computes the same
    * aggregate from the flat table — overwrite-on-retry == fresh load —
    * and pins `first_attempt_threw`, so a silently-passing first attempt
    * fails the hash gate.
    */
  def query(s: SparkSession, d: String): DataFrame = {
    val path = SessionPaths.scratch(s, "load_gate_orders")
    val full = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(12,2)").as("o_totalprice"))
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(s.sessionState.newHadoopConf())
    fs.delete(hPath, true)
    // the aborted half-load this gate exists to catch
    full.filter(col("o_orderkey") % 2 === 0).write.mode("overwrite").parquet(path)
    val threw =
      try { load(full, path, retryCount = 0); false }
      catch { case _: IllegalStateException => true }
    load(full, path, retryCount = 1)
    s.read.parquet(path)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), sum("o_totalprice").as("sum_total"))
      .withColumn("first_attempt_threw", lit(threw))
      .orderBy("o_orderstatus")
  }
}
