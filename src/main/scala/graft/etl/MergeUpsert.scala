package graft.etl

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A15: MERGE / upsert — the incremental-mirror primitive. The reference
  * refreshes a mirrored database by full reload
  * (RunnableDB/LoadFiles.pm: drop + CREATE DATABASE + LOAD DATA per
  * table); the incremental form a warehouse actually wants is
  * MERGE INTO snapshot USING updates: update matched keys, insert new
  * ones, delete tombstones. Spark-first that is one full-outer join on
  * the key — shuffle both sides by key once, no row-at-a-time RPCs — and
  * at scale the snapshot side is bucketed on the key so only the (much
  * smaller) update batch shuffles.
  */
object MergeUpsert {

  /** Generic merge: rows of `updates` win over `snapshot` on `key`;
    * updates with `tombstone` true delete the key. Column sets must match.
    */
  def merge(snapshot: DataFrame, updates: DataFrame, key: String,
            tombstone: String = "__delete"): DataFrame = {
    // updates usually derive from the snapshot (shared lineage), so give
    // every update column a fresh name before the join — qualified refs
    // alone are ambiguous on a self-lineage join
    val u = updates.columns.foldLeft(updates)((d, c) => d.withColumnRenamed(c, s"__u_$c"))
    snapshot.join(u, snapshot(key) === col(s"__u_$key"), "full_outer")
      .filter(!coalesce(col(s"__u_$tombstone"), lit(false)))
      .select(
        coalesce(col(s"__u_$key"), snapshot(key)).as(key) +:
          snapshot.columns.filter(_ != key).toIndexedSeq.map(c =>
            when(col(s"__u_$key").isNotNull, col(s"__u_$c")).otherwise(snapshot(c)).as(c)): _*)
  }

  /** A15 query: deterministic update batch against the orders snapshot —
    * every 10th order re-priced (+1.00), every 97th tombstoned, and one
    * synthetic new order per nation-sized stride appended. Oracle is the
    * same CASE/anti-join algebra in SQL.
    */
  def query(s: SparkSession, d: String): DataFrame = {
    val snap = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
    val repriced = snap.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        lit("R").as("o_orderstatus"),
        (col("o_totalprice") + 1.0).as("o_totalprice"),
        (col("o_orderkey") % 97 === 0).as("__delete"))
    val inserted = snap.agg(max("o_orderkey").as("mx"))
      .select(explode(sequence(lit(1), lit(5))).as("i"), col("mx"))
      .select((col("mx") + col("i")).as("o_orderkey"),
        col("i").cast("long").as("o_custkey"),
        lit("N").as("o_orderstatus"), lit(0.0).as("o_totalprice"),
        lit(false).as("__delete"))
    merge(snap, repriced.union(inserted), "o_orderkey")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(12,2)").cast("double").as("total"))
      .orderBy("o_orderkey")
  }
}
