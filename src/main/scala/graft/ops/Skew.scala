package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** B15: skew handling.
  *
  * First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
  * on in GraftSession) which splits oversized shuffle partitions at
  * runtime. This helper covers the pathological case AQE can't fix:
  * a single hot key whose *build side* row must meet millions of probe
  * rows — classic salting, as used by every large Spark shop:
  * the big side gets a random salt in [0, n), the small side is exploded
  * n× so every (key, salt) pair finds its match. Equivalence to a plain
  * join is asserted in SkewSpec.
  */
object Skew {

  /** Inner-join `big ⋈ small` on `key` with an n-way salt on the hot side.
    * `small` grows n× (broadcast-sized inputs only); `big` pays one extra
    * int column. Result is identical to `big.join(small, key)`.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, n: Int = 16): DataFrame = {
    val salted = big.withColumn("__salt", (rand(42) * n).cast("int"))
    val exploded = small.withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }

  /** B15 query: salted join of the big/skewed side (events) against a
    * small dim (customer), aggregated per market segment. The salt is
    * plumbing only — the result is identical to the unsalted join, which is
    * exactly what the DuckDB oracle computes. Decimal-cast sum keeps the
    * aggregate order-independent (see graft-oracle rules).
    */
  def qSkewSalted(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d).select(col("user_id"), col("value"))
    val cust = Tables.customer(s, d)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    saltedJoin(events, cust, "user_id")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,4)")).cast("double").as("sum_value"))
      .orderBy("c_mktsegment")
  }

  /** Top-n heavy keys of `df` on `keyCol` — the diagnostic used to decide
    * whether a salt (or a broadcast) is warranted.
    */
  def heavyHitters(df: DataFrame, keyCol: Column, topN: Int = 20): DataFrame =
    df.groupBy(keyCol.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key"))
      .limit(topN)
}
