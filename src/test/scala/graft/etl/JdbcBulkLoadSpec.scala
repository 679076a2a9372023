package graft.etl

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A13 executed for real: the bulk-load sink writes through an actual JDBC
  * driver into embedded Derby (in-memory, in this JVM — no server needed;
  * Derby ships with Spark), then the loaded table is read back and
  * verified by count + column checksum — the reference's load-then-verify
  * discipline (LoadFiles.pm:106-234) driven end-to-end.
  */
class JdbcBulkLoadSpec extends AnyFunSuite {

  test("bulk load writes partitioned batches through JDBC and the read-back verifies") {
    val s = TestSpark.spark
    val url = "jdbc:derby:memory:graftload;create=true"
    val t = JdbcBulkLoad.Target(url, "ORDERS_LOAD", user = "", password = "",
      numWriters = 4, batchSize = 500)
    val src = Tables.orders(s, TestSpark.sf).select(
      col("o_orderkey"), col("o_custkey"),
      col("o_totalprice").cast("decimal(12,2)").as("o_totalprice"),
      col("o_orderpriority"))
    JdbcBulkLoad.load(src, t)
    val back = s.read.format("jdbc")
      .option("url", url).option("dbtable", t.table).load()
    // count + checksum verify, both sides: the load is only done when the
    // destination proves it holds exactly what was shipped
    def fingerprint(df: org.apache.spark.sql.DataFrame): (Long, Long, java.math.BigDecimal) =
      (df.count(),
        df.agg(sum(col("o_orderkey") + col("o_custkey"))).head().getLong(0),
        df.agg(sum("o_totalprice")).head().getDecimal(0))
    val (nSrc, kSrc, pSrc) = fingerprint(src)
    val (nBack, kBack, pBack) = fingerprint(back)
    assert(nSrc > 0 && nBack == nSrc, s"row count: wrote $nSrc, read $nBack")
    assert(kBack == kSrc, s"key checksum: $kSrc vs $kBack")
    assert(pBack.compareTo(pSrc) == 0, s"price checksum: $pSrc vs $pBack")
    // appending the same batch again doubles the count — the sink appends
    // into standing DDL (the truncate option only bites on overwrite),
    // mirroring the reference's load-into-existing-schema behavior
    JdbcBulkLoad.load(src, t)
    assert(s.read.format("jdbc").option("url", url).option("dbtable", t.table)
      .load().count() == 2 * nSrc)
  }
}
