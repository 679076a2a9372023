package graft.etl

import org.apache.spark.sql.DataFrame

/** A13: JDBC bulk-load sink — EXECUTED end-to-end in JdbcBulkLoadSpec
  * against embedded Derby (in-memory, no server needed): partitioned
  * batched write → read-back → count + checksum verify, the reference's
  * load-then-verify discipline. No MySQL server exists in this
  * environment; the JDBC write path, connection-bounded parallelism and
  * batching are identical across drivers, so Derby exercises the real
  * code path and only the URL/dialect differ in production.
  *
  * The reference loads each table through one `LOAD DATA LOCAL INFILE`
  * statement on one connection, toggling indexes around the load
  * (LoadFiles.pm:137-143, 218-228). The Spark-native design:
  *
  *  - `df.repartition(numWriters)` bounds the number of concurrent
  *    connections — the MySQL-side analog of the reference's
  *    `analysis_capacity` lanes (PipeConfig/LoadDBs_conf.pm:108-210);
  *  - each partition streams batched inserts (`batchsize`) with
  *    `rewriteBatchedStatements=true`, which MySQL's driver rewrites into
  *    multi-row INSERTs — the closest network protocol gets to
  *    LOAD DATA throughput;
  *  - `truncate=true` keeps the DDL (and its indexes) in place, mirroring
  *    the reference's disable/enable-keys dance being about *appending*
  *    into existing DDL rather than recreating it;
  *  - at 100 TB the bottleneck is the single destination server, not
  *    Spark: `numWriters` caps pressure, and per-table loads parallelize
  *    across tables exactly like the reference's priority lanes.
  */
object JdbcBulkLoad {

  final case class Target(url: String, table: String, user: String, password: String,
                          numWriters: Int = 8, batchSize: Int = 10000)

  /** A13 driver-oracled roundtrip: bulk-load the supplier table into an
    * embedded Derby database THROUGH the real JDBC write path (4 bounded
    * writer connections, batched inserts), then read it back over JDBC
    * and hand the result to the DuckDB oracle — load-then-verify as a
    * rows+schema+hash gate, not just a spec assertion. Money rides as
    * exact cents (the JDBC typesystem roundtrips BIGINT losslessly;
    * decimal scale is dialect lore we refuse to depend on). Derby is
    * in-memory per-JVM — fine under local[32] where writers share the
    * JVM; production targets a server URL and only the URL/dialect
    * change (scaladoc above).
    */
  def roundtripQuery(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // keep Derby's log out of the repo root
    System.setProperty("derby.system.home", System.getProperty("java.io.tmpdir"))
    val src = graft.Tables.supplier(s, d).select(
      col("s_suppkey"), col("s_name"), col("s_nationkey"),
      (col("s_acctbal").cast("decimal(12,2)") * 100).cast("long").as("acctbal_cents"))
    val url = "jdbc:derby:memory:graft_rt_" +
      java.util.UUID.randomUUID.toString.replace("-", "") + ";create=true"
    load(src, Target(url, "SUPP_RT", "", "", numWriters = 4, batchSize = 1000))
    s.read.format("jdbc").option("url", url).option("dbtable", "SUPP_RT").load()
      .orderBy("s_suppkey")
  }

  val roundtripOracleSql: String = """
    SELECT s_suppkey, s_name, s_nationkey,
      CAST(CAST(s_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS acctbal_cents
    FROM supplier ORDER BY s_suppkey"""

  /** Write `df` into a MySQL-compatible target in bounded-parallel batches. */
  def load(df: DataFrame, t: Target): Unit =
    df.repartition(t.numWriters)
      .write
      .format("jdbc")
      .option("url", t.url)
      .option("dbtable", t.table)
      .option("user", t.user)
      .option("password", t.password)
      .option("batchsize", t.batchSize)
      .option("isolationLevel", "NONE")
      .option("truncate", value = true)
      .mode("append")
      .save()
}
