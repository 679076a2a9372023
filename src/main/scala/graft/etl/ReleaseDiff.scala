package graft.etl

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A26: release-to-release diff audit.
  *
  * The reference replaces a mirrored database wholesale each release
  * (LoadFiles.pm drop-and-reload) and the only drift signal is the
  * CHECKSUMS file per dump. The warehouse-scale question a mirror
  * operator actually asks is "what changed between release N−1 and N?" —
  * answered as ONE full-outer join of the two snapshots on the primary
  * key (each side shuffles once; over a key-bucketed layout, not at all)
  * classifying every key added / removed / changed / same, folded to a
  * class-grained summary with an order-independent bit_xor key checksum
  * (the shard_manifest technique) and the exact net value delta. Row
  * grain never leaves the executors; the output is 4 rows at any scale.
  *
  * The new release here is a deterministic mutation of the old (every
  * 10th order repriced +1.00, every 97th dropped, every 1000th cloned
  * under a new key) so the expected class counts are arithmetic facts
  * the oracle replays.
  */
object ReleaseDiff {

  def oldRelease(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey").as("k"), col("o_custkey"), col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long").as("price_c"))

  def newRelease(old: DataFrame): DataFrame =
    old.filter(col("k") % 97 =!= 0)
      .withColumn("price_c",
        when(col("k") % 10 === 0, col("price_c") + 100).otherwise(col("price_c")))
      .unionByName(
        old.filter(col("k") % 1000 === 0)
          .withColumn("k", col("k") + 100000000L))

  def query(s: SparkSession, d: String): DataFrame = {
    val old = oldRelease(s, d)
    // new derives from old (shared lineage): fresh names before the join
    val nw = newRelease(old).columns.foldLeft(newRelease(old))(
      (df, c) => df.withColumnRenamed(c, s"__n_$c"))
    old.join(nw, old("k") === col("__n_k"), "full_outer")
      .select(
        coalesce(col("__n_k"), col("k")).as("key"),
        when(col("k").isNull, "added")
          .when(col("__n_k").isNull, "removed")
          .when(col("o_custkey") =!= col("__n_o_custkey") ||
            col("o_orderstatus") =!= col("__n_o_orderstatus") ||
            col("price_c") =!= col("__n_price_c"), "changed")
          .otherwise("same").as("status"),
        (coalesce(col("__n_price_c"), lit(0L)) -
          coalesce(col("price_c"), lit(0L))).as("delta_c"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"),
        expr("bit_xor(CAST(conv(substring(md5(CAST(key AS STRING)), 1, 12), 16, 10) AS BIGINT))")
          .as("key_xor"),
        sum("delta_c").as("delta_cents"))
      .orderBy("status")
  }

  val oracleSql: String = """
    WITH old AS (SELECT o_orderkey AS k, o_custkey, o_orderstatus,
        CAST(round(o_totalprice * 100) AS BIGINT) AS price_c FROM orders),
    nw AS (
      SELECT k, o_custkey, o_orderstatus,
        CASE WHEN k % 10 = 0 THEN price_c + 100 ELSE price_c END AS price_c
      FROM old WHERE k % 97 <> 0
      UNION ALL
      SELECT k + 100000000, o_custkey, o_orderstatus, price_c
      FROM old WHERE k % 1000 = 0),
    j AS (SELECT coalesce(nw.k, old.k) AS key,
        CASE WHEN old.k IS NULL THEN 'added'
             WHEN nw.k IS NULL THEN 'removed'
             WHEN old.o_custkey <> nw.o_custkey
               OR old.o_orderstatus <> nw.o_orderstatus
               OR old.price_c <> nw.price_c THEN 'changed'
             ELSE 'same' END AS status,
        coalesce(nw.price_c, 0) - coalesce(old.price_c, 0) AS delta_c
      FROM old FULL OUTER JOIN nw ON old.k = nw.k)
    SELECT status, count(*) AS n,
      bit_xor(CAST(('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 12)) AS BIGINT)) AS key_xor,
      CAST(sum(delta_c) AS BIGINT) AS delta_cents
    FROM j GROUP BY status ORDER BY status"""
}
