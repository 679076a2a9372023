package graft.etl

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A22: SCD Type-2 history build — the dimension-versioning counterpart
  * of A15's MERGE. The reference keeps only the CURRENT release of a
  * mirrored database (RunnableDB/LoadFiles.pm drops and recreates the
  * schema per release — type-1, history destroyed); a warehouse wants
  * the type-2 form: every state an entity passed through, as validity
  * intervals [valid_from, valid_to) with the live row flagged current.
  *
  * Input is a change log (entity key, change time, tracked attribute);
  * the build is the classic three-step:
  *   1. change detection — lag(attr) over (key ORDER BY time): a row
  *      opens a new version only when the attribute actually changed
  *      (consecutive duplicates collapse into one version);
  *   2. version numbering — a running sum of the change flags;
  *   3. intervals — group to (key, version) for valid_from and the
  *      collapsed row count, then lead(valid_from) closes each interval
  *      (NULL = still current).
  *
  * Shape at 100 TB: ONE exchange for the whole build. Both window layers
  * and the aggregation share the key partitioning — lag and the running
  * sum use the same (key, time) sort; hashpartitioning(user_id) already
  * clusters the (user_id, version) group keys, so the aggregate adds no
  * shuffle; the closing lead window reuses it again. The plan assertion
  * in Scd2Spec pins exactly one Exchange.
  */
object Scd {

  /** A22 query: event_type as the tracked attribute per user over the
    * events change log. Times are exact epoch integers end-to-end
    * (micros for ordering, seconds in the output) — never raw
    * timestamps, per the oracle-hash discipline.
    *
    * No aggregate: a change row IS its version's open edge — it carries
    * the attribute and valid_from directly, and n_events is the
    * row-number gap to the next change. That removes the
    * Sort+SortAggregate a groupBy(key, version) would plan (min(string)
    * forces sort-agg; measured 1.7× slower at the scd2_10x stress) —
    * the full corpus is touched by exactly one sort, and the second
    * window runs on the version-sized change-row subset.
    */
  def scd2History(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val byUserAll = Window.partitionBy("user_id")
    val prev = lag("event_type", 1).over(byUser)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("chg", when(prev.isNull || prev =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("rn", row_number().over(byUser).cast("long"))
      .withColumn("tot", count(lit(1)).over(byUserAll))
      .filter(col("chg") === 1L) // change rows = version-sized
      .withColumn("version", row_number().over(byUser).cast("long"))
      .withColumn("valid_from_sec", expr("us DIV 1000000"))
      .withColumn("valid_to_sec", lead("valid_from_sec", 1).over(byUser))
      .withColumn("n_events",
        coalesce(lead("rn", 1).over(byUser), col("tot") + 1L) - col("rn"))
      .withColumn("is_current", col("valid_to_sec").isNull)
      .select("user_id", "version", "event_type", "valid_from_sec",
        "valid_to_sec", "is_current", "n_events")
      .orderBy("user_id", "version")
  }

  val scd2OracleSql: String = """
    WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
    x AS (SELECT user_id, event_id, event_type, us,
        CASE WHEN lag(event_type) OVER w IS NULL
               OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
    y AS (SELECT user_id, event_type, us,
        sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS UNBOUNDED PRECEDING) AS version
      FROM x),
    v AS (SELECT user_id, version, min(event_type) AS event_type,
        min(us) // 1000000 AS valid_from_sec, count(*) AS n_events
      FROM y GROUP BY user_id, version)
    SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
      CAST(valid_from_sec AS BIGINT) AS valid_from_sec,
      CAST(lead(valid_from_sec) OVER wv AS BIGINT) AS valid_to_sec,
      lead(valid_from_sec) OVER wv IS NULL AS is_current,
      CAST(n_events AS BIGINT) AS n_events
    FROM v WINDOW wv AS (PARTITION BY user_id ORDER BY version)
    ORDER BY user_id, version"""

  /** A22b: SCD2 with DELETES — the retraction half of dimension
    * versioning (the ivm_retract theme applied to A22): a tombstone in
    * the change log closes the entity's open version at the tombstone's
    * time WITHOUT opening a successor; a later change re-creates the
    * entity as a fresh version. An entity whose last change is a
    * tombstone has NO current row — `is_current` is false across its
    * whole history, which type-1 drop-and-reload destroys and the plain
    * A22 build cannot express.
    *
    * Build: tombstones enter the same change-detection pipeline as a
    * sentinel attribute value, so "close at delete" is just "next change
    * row's time" — one extra cumulative live-row count (for n_events
    * arithmetic across tombstone gaps) on the SAME single exchange as
    * A22; tombstone change rows are dropped after donating their
    * boundary. Consecutive tombstones collapse (no attribute change).
    * Tombstone rule: event_id % 41 = 0 (244 tombstones / 122 entities at
    * sf0.01 — re-creation after delete is exercised).
    */
  def scd2Deletes(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byUserAll = Window.partitionBy("user_id")
    val base = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("live", col("event_id") % 41 =!= 0)
      .withColumn("attr", when(col("live"), col("event_type")).otherwise("(deleted)"))
    val prev = lag("attr", 1).over(byUser)
    val ch = base
      .withColumn("chg", when(prev.isNull || prev =!= col("attr"), 1L).otherwise(0L))
      .withColumn("live_cum", sum(when(col("live"), 1L).otherwise(0L)).over(cum))
      .withColumn("total_live", sum(when(col("live"), 1L).otherwise(0L)).over(byUserAll))
      .filter(col("chg") === 1L)
      .withColumn("cum_before", col("live_cum") - when(col("live"), 1L).otherwise(0L))
      .withColumn("next_us", lead("us", 1).over(byUser))
      .withColumn("next_cb", lead("cum_before", 1).over(byUser))
    ch.filter(col("live"))
      .withColumn("version", row_number().over(byUser).cast("long"))
      .select(col("user_id"), col("version"), col("attr").as("event_type"),
        expr("us DIV 1000000").as("valid_from_sec"),
        expr("next_us DIV 1000000").as("valid_to_sec"),
        col("next_us").isNull.as("is_current"),
        (coalesce(col("next_cb"), col("total_live")) - col("cum_before")).as("n_events"))
      .orderBy("user_id", "version")
  }

  val scd2DeletesOracleSql: String = """
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
        (event_id % 41 <> 0) AS live,
        CASE WHEN event_id % 41 = 0 THEN '(deleted)' ELSE event_type END AS attr
      FROM events),
    x AS (
      SELECT *,
        CASE WHEN lag(attr) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
               OR lag(attr) OVER (PARTITION BY user_id ORDER BY us, event_id) <> attr
             THEN 1 ELSE 0 END AS chg,
        sum(CASE WHEN live THEN 1 ELSE 0 END)
          OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS live_cum,
        sum(CASE WHEN live THEN 1 ELSE 0 END) OVER (PARTITION BY user_id) AS total_live
      FROM e),
    ch AS (
      SELECT *, live_cum - CASE WHEN live THEN 1 ELSE 0 END AS cum_before
      FROM x WHERE chg = 1),
    ch2 AS (
      SELECT *,
        lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS next_us,
        lead(cum_before) OVER (PARTITION BY user_id ORDER BY us, event_id) AS next_cb
      FROM ch)
    SELECT user_id,
      CAST(row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT) AS version,
      attr AS event_type,
      CAST(us // 1000000 AS BIGINT) AS valid_from_sec,
      CAST(next_us // 1000000 AS BIGINT) AS valid_to_sec,
      next_us IS NULL AS is_current,
      CAST(coalesce(next_cb, total_live) - cum_before AS BIGINT) AS n_events
    FROM ch2 WHERE live ORDER BY user_id, version"""
}
