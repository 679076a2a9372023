package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Top-n heavy keys of `df` on `keyCol` — the diagnostic used to decide
    * whether a salt (or a broadcast) is warranted.
    */
  def heavyHitters(df: DataFrame, keyCol: Column, topN: Int = 20): DataFrame =
    df.groupBy(keyCol.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key"))
      .limit(topN)
}
