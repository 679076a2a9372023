package graft.sources

import java.nio.file.{Files => JFiles}

import scala.collection.JavaConverters._

import graft.Tables
import graft.etl.Snapshots
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Driver-oracled queries for the graft-snapshot data source — the A31
  * layer consumed through `spark.read.format` / `spark.readStream
  * .format` rather than the layer's own helpers, so the SOURCE
  * INTEGRATION itself (FileIndex listing, plan-time skipping, V1
  * streaming offsets) sits under the correctness gate.
  */
object SnapshotSourceQueries {

  private def rm(root: java.nio.file.Path): Unit = {
    val walk = JFiles.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(JFiles.deleteIfExists(_))
    finally walk.close()
  }

  /** Post-execution file-scan node of `df` (AQE-aware), for metric and
    * pushdown proofs. Driver-side plan introspection only — never data.
    */
  private def executedScan(df: DataFrame): FileSourceScanExec = {
    def find(p: org.apache.spark.sql.execution.SparkPlan): Option[FileSourceScanExec] =
      p match {
        case f: FileSourceScanExec    => Some(f)
        case a: AdaptiveSparkPlanExec => find(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => find(q.plan)
        case other => other.children.view.flatMap(find(_)).headOption
      }
    find(df.queryExecution.executedPlan).getOrElse(
      throw new IllegalStateException(
        s"no file scan in plan:\n${df.queryExecution.executedPlan}"))
  }

  /** Query `snapshot_scan`: orders published range-clustered with
    * manifest zone maps, then read back STRICTLY through
    * `spark.read.format("graft-snapshot")` with a key-range predicate.
    * Proofs required in-query before the answer is trusted:
    * (1) the scan opened strictly fewer files than the manifest lists —
    * i.e. Catalyst's pushed dataFilters reached [[SnapshotFileIndex]]
    * and the zone maps pruned during PLANNING; (2) the same predicate
    * also reached parquet row-group pushdown (`PushedFilters`). The
    * oracle is the plain filtered aggregate over the source table: the
    * hash gate proves the whole source stack — manifest listing,
    * file skipping, vectorized scan — changes I/O, never answers.
    */
  def snapshotScan(s: SparkSession, d: String): DataFrame = {
    val root = JFiles.createTempDirectory("graft_snapsc")
    try {
      val orders = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      Snapshots.publish(s, root, orders.repartitionByRange(8, col("o_orderkey")),
        statsCol = Some("o_orderkey"))
      val agg = s.read.format("graft-snapshot")
        .option("path", root.toString).option("statscol", "o_orderkey").load()
        .filter(col("o_orderkey").between(200L, 1099L))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_total_cents"))
      val out = agg.collect().map(r => Row(r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      val scan = executedScan(agg)
      val opened = scan.metrics("numFiles").value
      val total = Snapshots.manifest(root, 1).size
      require(opened < total,
        s"plan-time zone maps skipped nothing: opened $opened of $total")
      val pushed = scan.metadata("PushedFilters")
      require(pushed.contains("GreaterThanOrEqual(o_orderkey,200)"),
        s"range predicate missing from parquet pushdown: $pushed")
      val schema = StructType(Seq(
        StructField("o_orderstatus", StringType),
        StructField("n", LongType), StructField("sum_total_cents", LongType)))
      s.createDataFrame(s.sparkContext.parallelize(out, 1), schema)
        .orderBy("o_orderstatus")
    } finally rm(root)
  }

  /** Un-staged plan builder for [[snapshotScan]] (PlanOnly/PlanDoc): the
    * registered query returns a literal proof frame, which would
    * document nothing — this builds the REAL source-read tree (FileScan
    * over SnapshotFileIndex with PushedFilters) over a freshly staged
    * store. The temp store lives until JVM exit; plan-inspection
    * contexts only.
    */
  def snapshotScanPlan(s: SparkSession, d: String): DataFrame = {
    val root = JFiles.createTempDirectory("graft_snapsc_plan")
    val orders = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    Snapshots.publish(s, root, orders.repartitionByRange(8, col("o_orderkey")),
      statsCol = Some("o_orderkey"))
    s.read.format("graft-snapshot")
      .option("path", root.toString).option("statscol", "o_orderkey").load()
      .filter(col("o_orderkey").between(200L, 1099L))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_total_cents"))
  }

  val snapshotScanOracleSql: String = """
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_total_cents
    FROM orders WHERE o_orderkey BETWEEN 200 AND 1099
    GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** Query `snapshot_sql`: the layer from PURE SQL — the
    * `graft_snapshot` table-valued function (GraftExtensions) resolves
    * the store to the same manifest-planned relation, so a SQL-only
    * user (JDBC gateway, notebook cell) gets zone-map skipping and
    * parquet pushdown with no Scala API and no reader options: the
    * store is published with NAMED per-file stats (`k=lo:hi` manifest
    * tokens), which bind to predicate columns by name. The in-query
    * proof requires strictly fewer files opened than the manifest
    * lists; the oracle is the same SQL over the source table.
    */
  def snapshotSql(s: SparkSession, d: String): DataFrame = {
    val root = JFiles.createTempDirectory("graft_snapsq")
    try {
      val orders = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val fresh = Snapshots.stageOccMulti(s, root,
        orders.repartitionByRange(8, col("o_orderkey")), Seq("o_orderkey"))
      Snapshots.commitOcc(root, fresh, Snapshots.OccAppend)
      val agg = s.sql(
        s"""SELECT o_orderstatus, count(*) AS n, sum(cents) AS sum_total_cents
           |FROM graft_snapshot('$root')
           |WHERE o_orderkey BETWEEN 300 AND 1199
           |GROUP BY o_orderstatus""".stripMargin)
      val out = agg.collect().map(r => Row(r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      val scan = executedScan(agg)
      val opened = scan.metrics("numFiles").value
      val total = Snapshots.manifest(root, 1).size
      require(opened < total,
        s"SQL read skipped nothing: opened $opened of $total")
      val schema = StructType(Seq(
        StructField("o_orderstatus", StringType),
        StructField("n", LongType), StructField("sum_total_cents", LongType)))
      s.createDataFrame(s.sparkContext.parallelize(out, 1), schema)
        .orderBy("o_orderstatus")
    } finally rm(root)
  }

  val snapshotSqlOracleSql: String = """
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_total_cents
    FROM orders WHERE o_orderkey BETWEEN 300 AND 1199
    GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** Query `snapshot_write`: the batch WRITE path —
    * `df.write.format("graft-snapshot")` with SaveMode mapped onto the
    * layer's commit protocol. Two appended halves build the full table
    * (append 2 must REUSE append 1's files verbatim — required
    * in-query), then an Overwrite lands a rewrite commit while history
    * stays time-travelable. Both states are read back through the
    * SOURCE with snapshot pins; the oracle restates them from the
    * source table, so the hash gate proves the whole write→commit→read
    * loop: no row lost between releases, no stale file surfacing after
    * the overwrite.
    */
  def snapshotWrite(s: SparkSession, d: String): DataFrame = {
    val root = JFiles.createTempDirectory("graft_snapw")
    try {
      val orders = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      def save(df: DataFrame, mode: String): Unit =
        df.write.format("graft-snapshot").option("path", root.toString).mode(mode).save()
      save(orders.filter(col("o_orderkey") % 2 === 0), "error")
      save(orders.filter(col("o_orderkey") % 2 === 1), "append")
      val files1 = Snapshots.manifest(root, 1).map(_.relPath).toSet
      require(Snapshots.manifest(root, 2).map(_.relPath).toSet.intersect(files1) == files1,
        "append did not reuse the prior release's files")
      save(orders.filter(col("o_orderkey") < 2000), "overwrite")
      require(Snapshots.currentId(root).contains(3),
        s"expected 3 snapshots, got ${Snapshots.currentId(root)}")
      val out = Seq(2, 3).flatMap { n =>
        s.read.format("graft-snapshot").option("path", root.toString)
          .option("snapshot", n.toString).load()
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_total_cents"))
          .collect()
          .map(r => Row(n.toLong, r.getString(0), r.getLong(1), r.getLong(2)))
      }
      val schema = StructType(Seq(
        StructField("snapshot_id", LongType), StructField("o_orderstatus", StringType),
        StructField("n", LongType), StructField("sum_total_cents", LongType)))
      s.createDataFrame(s.sparkContext.parallelize(out, 1), schema)
        .orderBy("snapshot_id", "o_orderstatus")
    } finally rm(root)
  }

  val snapshotWriteOracleSql: String = """
    SELECT * FROM (
      SELECT 2 AS snapshot_id, o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_total_cents
      FROM orders GROUP BY o_orderstatus
      UNION ALL
      SELECT 3, o_orderstatus, CAST(count(*) AS BIGINT),
        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      FROM orders WHERE o_orderkey < 2000 GROUP BY o_orderstatus)
    ORDER BY snapshot_id, o_orderstatus"""

  /** Query `stream_snapshot_sink`: the streaming WRITE path behind the
    * format API — `writeStream.format("graft-snapshot")` lands one
    * atomic appended snapshot per micro-batch through the V1 sink (the
    * `stream_snapshot_ingest` commit protocol, but via `Sink.addBatch`
    * instead of a foreachBatch closure — a distinct code path through
    * the streaming-frame re-wrap). In-query proofs: exactly one
    * snapshot per micro-batch, and a replayed final batch id is a
    * no-op with the pointer unmoved. The landed table, read back
    * through the SOURCE, hash-matches the batch aggregate of the whole
    * feed: every event exactly once through format-level streaming I/O.
    */
  def streamSnapshotSink(s: SparkSession, d: String): DataFrame = {
    val root = JFiles.createTempDirectory("graft_snapsk")
    val src = JFiles.createTempDirectory("graft_snapsk_src")
    val ckpt = JFiles.createTempDirectory("graft_snapsk_ck")
    try {
      val ev = Tables.events(s, d).select(col("event_id"), col("ts"), col("event_type"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("cents"))
      ev.repartitionByRange(3, col("ts")).write.mode("overwrite").parquet(src.toString)
      val q = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(src.toString)
        .writeStream.format("graft-snapshot").option("path", root.toString)
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
      val nSnaps = Snapshots.currentId(root).getOrElse(0)
      require(nSnaps == 3, s"expected one snapshot per micro-batch, got $nSnaps")
      val last = Snapshots.lastBatchId(root).getOrElse(-1L)
      require(!Snapshots.publishBatch(s, root,
        Snapshots.readCurrent(s, root).limit(1), last),
        "replayed micro-batch must be skipped")
      require(Snapshots.currentId(root).contains(nSnaps), "replay moved the pointer")
      val out = s.read.format("graft-snapshot").option("path", root.toString).load()
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .collect()
        .map(r => Row(nSnaps.toLong, r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq
      val schema = StructType(Seq(
        StructField("n_snapshots", LongType), StructField("event_type", StringType),
        StructField("n", LongType), StructField("sum_cents", LongType)))
      s.createDataFrame(s.sparkContext.parallelize(out, 1), schema)
        .orderBy("event_type")
    } finally { rm(root); rm(src); rm(ckpt) }
  }

  val streamSnapshotSinkOracleSql: String = """
    SELECT CAST(3 AS BIGINT) AS n_snapshots, event_type,
      CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events GROUP BY event_type ORDER BY event_type"""

  /** Query `snapshot_txn_sql`: A32 cross-table transactions from PURE
    * SQL via the `graft_table` TVF. A hot→cold row MOVE (tombstones on
    * hot + appends on cold in ONE catalog commit) is read back by a
    * single SQL statement unioning BOTH tables at BOTH versions — each
    * version pin is cross-table consistent by the one-rename commit, so
    * the statement can never observe the move half-applied, and the
    * tombstone-carrying hot table reads exactly through the layer's
    * seq-aware merge. Oracle restates all four (version, table) states
    * from the source table: the hash gate is row-and-cent conservation
    * through the transaction, observed entirely from SQL.
    */
  def snapshotTxnSql(s: SparkSession, d: String): DataFrame = {
    val cat = JFiles.createTempDirectory("graft_txnsql")
    try {
      import graft.etl.TxnCatalog
      val orders = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val hotId = Snapshots.stageOnto(s, TxnCatalog.tableRoot(cat, "hot"),
        orders.filter(col("o_orderkey") % 2 === 1), None)
      val coldId = Snapshots.stageOnto(s, TxnCatalog.tableRoot(cat, "cold"),
        orders.filter(col("o_orderkey") % 2 === 0), None)
      val v1 = TxnCatalog.commit(cat, Map("hot" -> hotId, "cold" -> coldId), None)
      val moved = orders.filter(col("o_orderkey") % 10 === 3)
      val hotId2 = Snapshots.stageDeletesOnto(s, TxnCatalog.tableRoot(cat, "hot"),
        moved.select("o_orderkey"), hotId)
      val coldId2 = Snapshots.stageOnto(s, TxnCatalog.tableRoot(cat, "cold"),
        moved, Some(coldId))
      val v2 = TxnCatalog.commit(cat, Map("hot" -> hotId2, "cold" -> coldId2), Some(v1))
      val out = s.sql(
        s"""SELECT version, tbl, o_orderstatus, count(*) AS n,
           |  sum(cents) AS sum_total_cents
           |FROM (
           |  SELECT CAST($v1 AS BIGINT) AS version, 'cold' AS tbl, *
           |  FROM graft_table('$cat', 'cold', $v1)
           |  UNION ALL SELECT CAST($v1 AS BIGINT), 'hot', *
           |  FROM graft_table('$cat', 'hot', $v1)
           |  UNION ALL SELECT CAST($v2 AS BIGINT), 'cold', *
           |  FROM graft_table('$cat', 'cold', $v2)
           |  UNION ALL SELECT CAST($v2 AS BIGINT), 'hot', *
           |  FROM graft_table('$cat', 'hot', $v2))
           |GROUP BY version, tbl, o_orderstatus""".stripMargin)
        .collect()
        .map(r => Row(r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
        .toSeq
      val schema = StructType(Seq(
        StructField("version", LongType), StructField("tbl", StringType),
        StructField("o_orderstatus", StringType),
        StructField("n", LongType), StructField("sum_total_cents", LongType)))
      s.createDataFrame(s.sparkContext.parallelize(out, 1), schema)
        .orderBy("version", "tbl", "o_orderstatus")
    } finally rm(cat)
  }

  val snapshotTxnSqlOracleSql: String = """
    WITH b AS (SELECT o_orderkey AS k, o_orderstatus,
        CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
    SELECT CAST(1 AS BIGINT) AS version, 'cold' AS tbl, o_orderstatus,
      CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS sum_total_cents
    FROM b WHERE k % 2 = 0 GROUP BY o_orderstatus
    UNION ALL
    SELECT 1, 'hot', o_orderstatus, CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT)
    FROM b WHERE k % 2 = 1 GROUP BY o_orderstatus
    UNION ALL
    SELECT 2, 'cold', o_orderstatus, CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT)
    FROM b WHERE k % 2 = 0 OR k % 10 = 3 GROUP BY o_orderstatus
    UNION ALL
    SELECT 2, 'hot', o_orderstatus, CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT)
    FROM b WHERE k % 2 = 1 AND k % 10 <> 3 GROUP BY o_orderstatus
    ORDER BY version, tbl, o_orderstatus"""

  /** Query `stream_snapshot_source`: the store consumed as a REAL
    * micro-batch stream. Three releases exist at stream start; a fourth
    * is published MID-STREAM between drains, so the source must advance
    * its snapshot offset and deliver exactly the increment's files.
    * In-query proofs: the first drain saw exactly the first three
    * releases' rows (the mid-stream increment genuinely arrived later),
    * and the final state is gated by the oracle — the plain aggregate
    * of ALL orders, so one duplicated or dropped increment row fails
    * the hash. This is the lakehouse CDC loop closed: `publish` commits
    * upstream, `readStream` consumes downstream, offsets ARE snapshot
    * ids.
    */
  def streamSnapshotSource(s: SparkSession, d: String): DataFrame = {
    val root = JFiles.createTempDirectory("graft_snapss")
    try {
      val orders = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      (0 until 3).foreach { k =>
        Snapshots.publish(s, root, orders.filter(col("o_orderkey") % 4 === k),
          append = k > 0)
      }
      // parquet sink, NOT the memory sink: a memory sink materializes
      // every streamed row as driver-heap objects — at the self-run
      // sf10 (15M rows) that is a guaranteed driver OOM
      val sinkDir = JFiles.createTempDirectory("graft_snapss_sink")
      val q = s.readStream.format("graft-snapshot").option("path", root.toString).load()
        .writeStream.format("parquet")
        .option("path", sinkDir.resolve("data").toString)
        .option("checkpointLocation", sinkDir.resolve("ckpt").toString)
        .outputMode("append").start()
      def sinkDf = s.read.schema(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("o_orderkey",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("o_orderstatus",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("cents",
            org.apache.spark.sql.types.LongType))))
        .parquet(sinkDir.resolve("data").toString)
      try {
        q.processAllAvailable()
        val firstDrain = sinkDf.count()
        val expectFirst = orders.filter(col("o_orderkey") % 4 < 3).count()
        require(firstDrain == expectFirst,
          s"first drain saw $firstDrain rows, expected the 3 releases' $expectFirst")
        Snapshots.publish(s, root, orders.filter(col("o_orderkey") % 4 === 3),
          append = true)
        q.processAllAvailable()
      } finally q.stop()
      val out = sinkDf
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_total_cents"))
        .orderBy("o_orderstatus")
      val rows = out.collect().toSeq
      rm(sinkDir)
      s.createDataFrame(s.sparkContext.parallelize(rows, 1), out.schema)
        .orderBy("o_orderstatus")
    } finally rm(root)
  }

  val streamSnapshotSourceOracleSql: String = """
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_total_cents
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** Query `stream_cdf`: the retraction-aware CHANGE FEED consumed as a
    * live micro-batch stream — the path a downstream consumer of a
    * MUTATING table needs (r13's sources refused tombstone windows;
    * this is the `changefeed=true` mode that delivers them). The run
    * drives inserts, UPDATEs (upsert: old image retracted + new image
    * inserted) and DELETEs (old images retracted) across four commits
    * drained as separate micro-batches, with a full query STOP and
    * checkpointed RESTART in the middle — exactly-once across the
    * restart is load-bearing, not decorative. The consumer applies the
    * canonical retraction semantics (inserts exceptAll deletes) and the
    * oracle gates the reconstructed final state: one double-delivered
    * or dropped change image fails the hash.
    */
  def streamCdf(s: SparkSession, d: String): DataFrame = {
    val root = JFiles.createTempDirectory("graft_scdf")
    val sinkDir = JFiles.createTempDirectory("graft_scdf_sink")
    try {
      val orders = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val k = col("o_orderkey")
      // commit 1: keys %4 in (0,1)
      Snapshots.publish(s, root, orders.filter(k % 4 < 2))
      def startQ() = s.readStream.format("graft-snapshot")
        .option("path", root.toString).option("changefeed", "true").load()
        .writeStream.format("parquet")
        .option("path", sinkDir.resolve("data").toString)
        .option("checkpointLocation", sinkDir.resolve("ckpt").toString)
        .outputMode("append").start()
      val sinkSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderkey", LongType),
        org.apache.spark.sql.types.StructField("o_orderstatus", StringType),
        org.apache.spark.sql.types.StructField("cents", LongType),
        org.apache.spark.sql.types.StructField("_change_type", StringType)))
      def sinkDf = s.read.schema(sinkSchema).parquet(sinkDir.resolve("data").toString)
      val q1 = startQ()
      try {
        q1.processAllAvailable()
        // initial batch: the whole founding state as inserts, no retractions
        val (n1, d1) = (sinkDf.count(),
          sinkDf.filter(col("_change_type") === "delete").count())
        require(d1 == 0 && n1 == orders.filter(k % 4 < 2).count(),
          s"initial CDF batch wrong: $n1 rows, $d1 deletes")
        // commit 2 MID-STREAM: UPDATE keys %8==1 (cents+7), INSERT keys %4==2
        Snapshots.publishUpsert(s, root,
          orders.filter(k % 8 === 1).withColumn("cents", col("cents") + 7)
            .unionByName(orders.filter(k % 4 === 2)), "o_orderkey")
        q1.processAllAvailable()
      } finally q1.stop()
      // checkpointed RESTART mid-feed: the resumed query must pick up at
      // the committed snapshot offset — no replayed or dropped window
      val q2 = startQ()
      try {
        q2.processAllAvailable()
        // commit 3: DELETE keys %8 in (0,2) — retracts c1 rows AND c2 inserts
        Snapshots.publishDeletes(s, root,
          orders.filter(k % 8 === 0 || k % 8 === 2).select("o_orderkey"))
        // commit 4: INSERT keys %4==3
        Snapshots.publish(s, root, orders.filter(k % 4 === 3), append = true)
        q2.processAllAvailable()
      } finally q2.stop()
      // retraction-consumer semantics: every delete row carries the OLD
      // image, so the tracked state is inserts exceptAll deletes
      val feed = sinkDf
      val expectedDeletes = orders.filter(k % 8 === 1).count() +
        orders.filter(k % 8 === 0 || k % 8 === 2).count()
      require(feed.filter(col("_change_type") === "delete").count() == expectedDeletes,
        "CDF must retract exactly the updated + deleted old images")
      val state = feed.filter(col("_change_type") === "insert").drop("_change_type")
        .exceptAll(feed.filter(col("_change_type") === "delete").drop("_change_type"))
      val out = state.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .orderBy("o_orderstatus")
      val rows = out.collect().toSeq
      s.createDataFrame(s.sparkContext.parallelize(rows, 1), out.schema)
        .orderBy("o_orderstatus")
    } finally { rm(sinkDir); rm(root) }
  }

  val streamCdfOracleSql: String = """
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM (
      SELECT o_orderstatus,
        CAST(round(o_totalprice * 100) AS BIGINT)
          + CASE WHEN o_orderkey % 8 = 1 THEN 7 ELSE 0 END AS cents
      FROM orders
      WHERE o_orderkey % 8 NOT IN (0, 2)
    ) GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** Query `stream_upsert`: the UPSERT streaming sink — `writeStream
    * .format("graft-snapshot").option("morkey", k)` lands each
    * micro-batch as ONE atomic tombstone+rows merge-on-read commit,
    * exactly-once by the batch id riding the pointer rename. Three
    * overlapping waves stream from an upstream snapshot store (window
    * order is commit order, so last-writer-wins is deterministic), with
    * a full STOP + checkpointed RESTART between waves; later waves
    * OVERWRITE keys earlier waves landed. Required in-query: one
    * mirror snapshot per non-empty batch, a replayed batch id is a
    * provable no-op, and the final merged state carries exactly the
    * last wave's image per key — one doubled or dropped upsert fails
    * the hash.
    */
  def streamUpsert(s: SparkSession, d: String): DataFrame = {
    val up = JFiles.createTempDirectory("graft_sups_up")
    val mirror = JFiles.createTempDirectory("graft_sups_mir")
    val ckpt = JFiles.createTempDirectory("graft_sups_ck")
    try {
      val orders = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val k = col("o_orderkey")
      // wave 1 (founding window): keys %4 in (0,1)
      Snapshots.publish(s, up, orders.filter(k % 4 < 2))
      def startQ() = s.readStream.format("graft-snapshot")
        .option("path", up.toString).load()
        .writeStream.format("graft-snapshot")
        .option("path", mirror.toString).option("morkey", "o_orderkey")
        .option("checkpointLocation", ckpt.toString).start()
      val q1 = startQ()
      try {
        q1.processAllAvailable()
        // wave 2 MID-STREAM: every even key re-lands with cents+5 —
        // overlaps wave 1's %4==0 keys (upsert) and inserts %4==2
        Snapshots.publish(s, up, orders.filter(k % 2 === 0)
          .withColumn("cents", col("cents") + 5), append = true)
        q1.processAllAvailable()
      } finally q1.stop()
      val q2 = startQ()
      try {
        q2.processAllAvailable()
        // wave 3 after the checkpointed restart: keys %4==3, cents+9
        Snapshots.publish(s, up, orders.filter(k % 4 === 3)
          .withColumn("cents", col("cents") + 9), append = true)
        q2.processAllAvailable()
      } finally q2.stop()
      val nSnaps = Snapshots.currentId(mirror).getOrElse(0)
      require(nSnaps == 3, s"expected one mirror snapshot per wave, got $nSnaps")
      val last = Snapshots.lastBatchId(mirror).getOrElse(-1L)
      require(!Snapshots.publishUpsertBatch(s, mirror,
        orders.filter(k % 4 === 3).limit(1), "o_orderkey", last),
        "replayed micro-batch must be skipped")
      require(Snapshots.currentId(mirror).contains(nSnaps), "replay moved the pointer")
      val out = Snapshots.readCurrent(s, mirror)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .orderBy("o_orderstatus")
      val rows = out.collect().toSeq
      s.createDataFrame(s.sparkContext.parallelize(rows, 1), out.schema)
        .orderBy("o_orderstatus")
    } finally { rm(ckpt); rm(mirror); rm(up) }
  }

  val streamUpsertOracleSql: String = """
    WITH b AS (SELECT o_orderkey AS k, o_orderstatus,
        CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
    fin AS (
      SELECT o_orderstatus, cents + 5 AS cents FROM b WHERE k % 2 = 0
      UNION ALL SELECT o_orderstatus, cents FROM b WHERE k % 4 = 1
      UNION ALL SELECT o_orderstatus, cents + 9 FROM b WHERE k % 4 = 3)
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM fin GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** Query `stream_mirror`: the COMPLETE mirror-maintenance pipeline —
    * `readStream.option("changefeed", true)` on a MUTATING upstream
    * piped straight into the upsert sink with `applychangefeed=true`,
    * no foreachBatch glue. The upstream takes inserts, UPDATEs and
    * DELETEs across four commits (the stream_cdf churn script); the
    * feed delivers net row-level changes per window; the sink collapses
    * each window (insert rows upsert, delete-only keys tombstone) into
    * one atomic mirror commit. A STOP + checkpointed RESTART lands
    * mid-feed. Required in-query: the mirror equals the upstream
    * row-for-row at the end (both directions of EXCEPT ALL empty) —
    * this is the reference's nightly-refresh mirror consumed
    * CONTINUOUSLY, updates and deletes included.
    */
  def streamMirror(s: SparkSession, d: String): DataFrame = {
    val up = JFiles.createTempDirectory("graft_smir_up")
    val mirror = JFiles.createTempDirectory("graft_smir_mir")
    val ckpt = JFiles.createTempDirectory("graft_smir_ck")
    try {
      val orders = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val k = col("o_orderkey")
      Snapshots.publish(s, up, orders.filter(k % 4 < 2))
      def startQ() = s.readStream.format("graft-snapshot")
        .option("path", up.toString).option("changefeed", "true").load()
        .writeStream.format("graft-snapshot")
        .option("path", mirror.toString).option("morkey", "o_orderkey")
        .option("applychangefeed", "true")
        .option("checkpointLocation", ckpt.toString).start()
      val q1 = startQ()
      try {
        q1.processAllAvailable()
        // UPDATE keys %8==1 (cents+7), INSERT keys %4==2 — one commit
        Snapshots.publishUpsert(s, up,
          orders.filter(k % 8 === 1).withColumn("cents", col("cents") + 7)
            .unionByName(orders.filter(k % 4 === 2)), "o_orderkey")
        q1.processAllAvailable()
      } finally q1.stop()
      val q2 = startQ()
      try {
        q2.processAllAvailable()
        // DELETE keys %8 in (0,2); then INSERT keys %4==3
        Snapshots.publishDeletes(s, up,
          orders.filter(k % 8 === 0 || k % 8 === 2).select("o_orderkey"))
        Snapshots.publish(s, up, orders.filter(k % 4 === 3), append = true)
        q2.processAllAvailable()
      } finally q2.stop()
      // the mirror IS the upstream: row-for-row, both directions. Both
      // sides are MERGE-ON-READ reads (base ⟕ tombstone anti-joins);
      // materialize each ONCE — the two exceptAll directions plus the
      // final aggregate would otherwise re-run both merged reads five
      // times (guide §5: persist the reused-and-expensive frame).
      val upNow = Snapshots.readCurrent(s, up).localCheckpoint()
      val mirNow = Snapshots.readCurrent(s, mirror).localCheckpoint()
      require(mirNow.exceptAll(upNow).isEmpty && upNow.exceptAll(mirNow).isEmpty,
        "mirror diverged from the upstream it tracks")
      val out = mirNow.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .orderBy("o_orderstatus")
      val rows = out.collect().toSeq
      s.createDataFrame(s.sparkContext.parallelize(rows, 1), out.schema)
        .orderBy("o_orderstatus")
    } finally { rm(ckpt); rm(mirror); rm(up) }
  }

  val streamMirrorOracleSql: String = """
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM (
      SELECT o_orderstatus,
        CAST(round(o_totalprice * 100) AS BIGINT)
          + CASE WHEN o_orderkey % 8 = 1 THEN 7 ELSE 0 END AS cents
      FROM orders
      WHERE o_orderkey % 8 NOT IN (0, 2)
    ) GROUP BY o_orderstatus ORDER BY o_orderstatus"""
}
