package graft.sources

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import graft.etl.Snapshots
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The graft-snapshot data source: manifest-driven listing (never a
  * directory scan), plan-time zone-map + bloom file skipping fed by
  * Catalyst's pushed predicates, parquet pushdown/pruning intact under
  * Spark's own scan, snapshot/ref pinning, the tombstone refusal, and
  * the streaming CDC source's exactly-once delivery incl. a
  * checkpointed restart.
  */
class SnapshotSourceSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private def tmpRoot(): Path = Files.createTempDirectory("graft_snapsrc")

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  private def block(tag: Int, rows: Int = 100): DataFrame = {
    val sq = s; import sq.implicits._
    (0 until rows).map(i => (tag.toLong, i.toLong)).toDF("tag", "i")
  }

  private def keyed(n: Int): DataFrame = {
    val sq = s; import sq.implicits._
    (0 until n).map(i => (i.toLong, s"v$i")).toDF("k", "v")
  }

  private def read(root: Path, extra: (String, String)*): DataFrame = {
    val r = s.read.format("graft-snapshot").option("path", root.toString)
    extra.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  /** Execute and return the (post-AQE) file scan node, metrics populated. */
  private def scanOf(df: DataFrame): FileSourceScanExec = {
    df.collect()
    // recurse through AQE wrappers: QueryStageExec is a LEAF of the
    // outer tree whose real subtree hangs off .plan
    def find(p: org.apache.spark.sql.execution.SparkPlan): Option[FileSourceScanExec] =
      p match {
        case f: FileSourceScanExec    => Some(f)
        case a: AdaptiveSparkPlanExec => find(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => find(q.plan)
        case other => other.children.view.flatMap(find(_)).headOption
      }
    find(df.queryExecution.executedPlan).getOrElse(
      fail(s"no FileSourceScanExec in:\n${df.queryExecution.executedPlan}"))
  }

  private def numFiles(df: DataFrame): Long = scanOf(df).metrics("numFiles").value

  test("batch read equals the layer's own readAt") {
    val root = tmpRoot()
    try {
      (1 to 3).foreach(k => Snapshots.publish(s, root, block(k), append = k > 1))
      val viaSource = read(root).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val viaLayer = Snapshots.readAt(s, root, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(viaSource.length == 300)
      assert(viaSource.toSeq == viaLayer.toSeq)
    } finally rm(root)
  }

  test("pushed range predicate prunes files at PLAN time via zone maps") {
    val root = tmpRoot()
    try {
      val sq = s; import sq.implicits._
      val rows = (0 until 8000).map(i => (i.toLong, i % 7L)).toDF("k", "g")
      Snapshots.publish(s, root, rows.repartitionByRange(8, col("k")),
        statsCol = Some("k"))
      val total = Snapshots.manifest(root, 1).size
      val q = read(root, "statscol" -> "k").filter(col("k").between(1000, 1999))
      val opened = numFiles(q)
      assert(opened < total, s"zone maps skipped nothing: $opened of $total")
      assert(q.count() == 1000)
      // pruning is an I/O optimization only: same rows as the full scan
      assert(read(root).filter(col("k").between(1000, 1999)).count() == 1000)
      // and the predicate ALSO reached parquet as a pushed filter
      val pushed = scanOf(q).metadata("PushedFilters")
      assert(pushed.contains("GreaterThanOrEqual(k,1000)") &&
        pushed.contains("LessThanOrEqual(k,1999)"), pushed)
    } finally rm(root)
  }

  test("named multi-column zone maps prune on either dimension, no option needed") {
    val root = tmpRoot()
    try {
      val sq = s; import sq.implicits._
      val rows = (0 until 4000).map(i => (i.toLong, (4000 - i).toLong)).toDF("x", "y")
      val fresh = Snapshots.stageOccMulti(s, root, rows.repartitionByRange(8, col("x")),
        Seq("x", "y"))
      val id = Snapshots.commitOcc(root, fresh, Snapshots.OccAppend)
      val total = Snapshots.manifest(root, id).size
      val qx = read(root).filter(col("x") < 500)
      val qy = read(root).filter(col("y") <= 500)
      assert(numFiles(qx) < total)
      assert(numFiles(qy) < total)
      assert(qx.count() == 500 && qy.count() == 500)
    } finally rm(root)
  }

  test("bloom sidecars prune point lookups on hash layouts") {
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, keyed(4000).repartition(8, col("k")))
      Snapshots.buildBlooms(s, root, 1, "k")
      val total = Snapshots.manifest(root, 1).size
      val q = read(root).filter(col("k") === 1234L)
      val opened = numFiles(q)
      assert(opened < total, s"blooms skipped nothing: $opened of $total")
      assert(q.collect().map(_.getString(1)).toSeq == Seq("v1234"))
      // absent key: every bloom rejects, zero files opened, empty exact answer
      val miss = read(root).filter(col("k") === 999999L)
      assert(numFiles(miss) == 0 && miss.count() == 0)
    } finally rm(root)
  }

  test("blooms never skip on a point constraint over a NON-key column") {
    // regression: sidecars are built over ONE declared column (k). A
    // point predicate on any other column must not probe them — the
    // k-bloom almost surely rejects another column's value and the scan
    // would silently skip files that DO hold matching rows.
    val root = tmpRoot()
    try {
      val sq = s; import sq.implicits._
      // w = k + 10_000_000: no w value ever appears in the k-bloom
      val rows = (0 until 4000).map(i => (i.toLong, i + 10000000L)).toDF("k", "w")
      Snapshots.publish(s, root, rows.repartition(8, col("k")))
      Snapshots.buildBlooms(s, root, 1, "k")
      val q = read(root).filter(col("w") === 10001234L)
      assert(numFiles(q) > 0, "file wrongly bloom-skipped on non-key column")
      assert(q.collect().map(_.getLong(0)).toSeq == Seq(1234L))
      // the marker records the key column; a conflicting rebuild is refused
      assert(Snapshots.bloomColumn(root).contains("k"))
      intercept[IllegalArgumentException] {
        Snapshots.buildBlooms(s, root, 1, "w")
      }
      // and readPoint on the non-key column stays exact too (no skipping)
      val viaPoint = Snapshots.readPoint(s, root, 1, "w", Seq(10001234L))
      assert(viaPoint.collect().map(_.getLong(0)).toSeq == Seq(1234L))
    } finally rm(root)
  }

  test("column pruning reaches the scan") {
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, keyed(100))
      val scan = scanOf(read(root).select("v").filter(col("v") === "v7"))
      assert(scan.requiredSchema.fieldNames.toSeq == Seq("v"))
    } finally rm(root)
  }

  test("snapshot option is time travel; ref option reads a branch head") {
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, block(1))
      Snapshots.publish(s, root, block(2), append = true)
      assert(read(root, "snapshot" -> "1").count() == 100)
      assert(read(root).count() == 200)
      Snapshots.createBranch(root, "dev", atId = 1)
      Snapshots.publishToBranch(s, root, "dev", block(7), append = true)
      val dev = read(root, "ref" -> "dev")
      assert(dev.count() == 200 &&
        dev.select("tag").distinct().collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 7L))
      // main unchanged by the branch write
      assert(read(root).select("tag").distinct().count() == 2)
    } finally rm(root)
  }

  test("a tombstone-bearing snapshot is refused loudly, never silently wrong") {
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, keyed(100))
      val sq = s; import sq.implicits._
      Snapshots.publishDeletes(s, root, Seq(5L, 6L).toDF("k"))
      val e = intercept[IllegalArgumentException](read(root).collect())
      assert(e.getMessage.contains("tombstone"))
      // compaction folds the deletes in physically and restores scannability
      Snapshots.compact(s, root, targetFiles = 2)
      assert(read(root).count() == 98)
    } finally rm(root)
  }

  test("graft_snapshot table function: the layer from pure SQL, pins included") {
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, block(1))
      Snapshots.publish(s, root, block(2), append = true)
      Snapshots.createTag(root, "v1", atId = 1)
      assert(s.sql(s"SELECT count(*) FROM graft_snapshot('$root')").head().getLong(0) == 200)
      assert(s.sql(s"SELECT count(*) FROM graft_snapshot('$root', 1)").head().getLong(0) == 100)
      assert(s.sql(s"SELECT count(*) FROM graft_snapshot('$root', 'v1')").head().getLong(0) == 100)
      // joins/filters compose like any relation
      val tagSum = s.sql(
        s"SELECT tag, count(*) AS n FROM graft_snapshot('$root') WHERE i < 10 GROUP BY tag ORDER BY tag")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(tagSum == Seq((1L, 10L), (2L, 10L)))
    } finally rm(root)
  }

  test("graft_snapshot SQL reads prune via named zone maps, no options needed") {
    val root = tmpRoot()
    try {
      val sq = s; import sq.implicits._
      val rows = (0 until 8000).map(i => (i.toLong, i % 5L)).toDF("k", "g")
      val fresh = Snapshots.stageOccMulti(s, root,
        rows.repartitionByRange(8, col("k")), Seq("k"))
      Snapshots.commitOcc(root, fresh, Snapshots.OccAppend)
      val q = s.sql(s"SELECT count(*) AS n FROM graft_snapshot('$root') WHERE k BETWEEN 2000 AND 2999")
      assert(q.head().getLong(0) == 1000)
      assert(numFiles(q) < 8)
    } finally rm(root)
  }

  test("graft_table: cross-table-consistent SQL reads at a catalog version") {
    val cat = Files.createTempDirectory("graft_tvfcat")
    try {
      import graft.etl.TxnCatalog
      val hotId = Snapshots.stageOnto(s, TxnCatalog.tableRoot(cat, "hot"), keyed(100), None)
      val coldId0 = Snapshots.stageOnto(s, TxnCatalog.tableRoot(cat, "cold"),
        keyed(200).filter(col("k") >= 100), None)
      val v1 = TxnCatalog.commit(cat, Map("hot" -> hotId, "cold" -> coldId0), None)
      // move keys 0-9 hot -> cold in ONE catalog commit
      val sq = s; import sq.implicits._
      val hotId2 = Snapshots.stageDeletesOnto(s, TxnCatalog.tableRoot(cat, "hot"),
        (0 until 10).map(_.toLong).toDF("k"), hotId)
      val coldId2 = Snapshots.stageOnto(s, TxnCatalog.tableRoot(cat, "cold"),
        keyed(10), Some(coldId0))
      val v2 = TxnCatalog.commit(cat, Map("hot" -> hotId2, "cold" -> coldId2), Some(v1))
      // one SQL statement, both tables at one version: always conserves
      for (v <- Seq(v1, v2)) {
        val total = s.sql(
          s"""SELECT count(*) FROM (
             |  SELECT k FROM graft_table('$cat', 'hot', $v)
             |  UNION ALL SELECT k FROM graft_table('$cat', 'cold', $v))""".stripMargin)
          .head().getLong(0)
        assert(total == 200, s"version $v tore the move: $total")
      }
      // the tombstoned table reads exactly at v2; default pin = current
      assert(s.sql(s"SELECT count(*) FROM graft_table('$cat', 'hot')").head().getLong(0) == 90)
      assert(s.sql(s"SELECT count(*) FROM graft_table('$cat', 'cold', $v1)").head().getLong(0) == 100)
    } finally rm(cat)
  }

  test("batch write path: SaveMode maps onto the layer's commit protocol") {
    val root = tmpRoot()
    try {
      def save(df: DataFrame, mode: String, extra: (String, String)*): Unit = {
        val w = df.write.format("graft-snapshot").option("path", root.toString).mode(mode)
        extra.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }.save()
      }
      // default ErrorIfExists founds the store...
      save(block(1), "error")
      assert(Snapshots.currentId(root).contains(1))
      // ...and refuses a second founding write
      intercept[IllegalStateException](save(block(9), "error"))
      // appends chain releases; prior files are reused verbatim
      save(block(2), "append")
      val files1 = Snapshots.manifest(root, 1).map(_.relPath).toSet
      assert(Snapshots.manifest(root, 2).map(_.relPath).toSet.intersect(files1) == files1)
      assert(read(root).count() == 200)
      // ignore on an existing store is a no-op
      save(block(9), "ignore")
      assert(Snapshots.currentId(root).contains(2) && read(root).count() == 200)
      // occ append goes through the optimistic commit
      save(block(3), "append", "occ" -> "true")
      assert(read(root).count() == 300)
      // overwrite is a rewrite commit; history stays readable
      save(block(7), "overwrite")
      val head = Snapshots.currentId(root).get
      assert(read(root).select("tag").distinct().collect().map(_.getLong(0)).toSeq == Seq(7L))
      assert(read(root, "snapshot" -> (head - 1).toString).count() == 300)
      // a written statscol is immediately prunable by the read path
      val root2 = tmpRoot()
      try {
        keyed(4000).repartitionByRange(8, col("k"))
          .write.format("graft-snapshot").option("path", root2.toString)
          .option("statscol", "k").save()
        val q = read(root2, "statscol" -> "k").filter(col("k") < 500)
        assert(numFiles(q) < 8 && q.count() == 500)
      } finally rm(root2)
    } finally rm(root)
  }

  test("streaming sink: one snapshot per micro-batch, replay-safe across restart") {
    val root = tmpRoot()
    val src = Files.createTempDirectory("graft_snapsink_src")
    val ckpt = Files.createTempDirectory("graft_snapsink_ckpt")
    try {
      // stage 3 files; maxFilesPerTrigger=1 => one micro-batch per file
      (1 to 3).foreach(k => block(k).coalesce(1)
        .write.mode("append").parquet(src.toString))
      def run() = TestSpark.spark.readStream.schema(block(1).schema)
        .option("maxFilesPerTrigger", 1).parquet(src.toString)
        .writeStream.format("graft-snapshot").option("path", root.toString)
        .option("checkpointLocation", ckpt.toString).start()
      val q1 = run()
      try q1.processAllAvailable() finally q1.stop()
      assert(Snapshots.currentId(root).contains(3), "one snapshot per micro-batch")
      assert(read(root).count() == 300)
      // restart on the same checkpoint: nothing new => no re-ingest
      val q2 = run()
      try q2.processAllAvailable() finally q2.stop()
      assert(Snapshots.currentId(root).contains(3) && read(root).count() == 300,
        "restart replayed a committed batch")
      // the landed table is a full citizen: time travel per batch
      assert(read(root, "snapshot" -> "1").count() == 100)
      assert(read(root, "snapshot" -> "2").count() == 200)
    } finally { rm(root); rm(src); rm(ckpt) }
  }

  test("streaming source: every appended row exactly once, incl. a later commit") {
    val root = tmpRoot()
    try {
      (1 to 3).foreach(k => Snapshots.publish(s, root, block(k), append = k > 1))
      val q = s.readStream.format("graft-snapshot").option("path", root.toString).load()
        .writeStream.format("memory").queryName("snapsrc_m").outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = s.table("snapsrc_m").groupBy("tag").count()
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == (1 to 3).map(t => t.toLong -> 100L).toMap)
        Snapshots.publish(s, root, block(4), append = true)
        q.processAllAvailable()
        val got2 = s.table("snapsrc_m").groupBy("tag").count()
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got2 == (1 to 4).map(t => t.toLong -> 100L).toMap)
      } finally q.stop()
    } finally rm(root)
  }

  test("batch read schema-merges evolved commits; time travel keeps the old shape") {
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, block(1))
      Snapshots.publish(s, root, block(2).withColumn("extra", lit(9L)), append = true)
      val now = read(root)
      assert(now.columns.toSeq == Seq("tag", "i", "extra"))
      // pre-evolution rows surface the appended column as NULL
      assert(now.filter(col("tag") === 1 && col("extra").isNull).count() == 100)
      assert(now.filter(col("tag") === 2 && col("extra") === 9L).count() == 100)
      // pinned old snapshot keeps the old shape
      assert(read(root, "snapshot" -> "1").columns.toSeq == Seq("tag", "i"))
    } finally rm(root)
  }

  test("streaming getBatch conforms pre-evolution files to the source schema") {
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, block(1)) // 2-col files only
      val evolved = org.apache.spark.sql.types.StructType(
        block(1).schema.fields :+
          org.apache.spark.sql.types.StructField("extra",
            org.apache.spark.sql.types.LongType))
      // a replayed batch whose files ALL predate the appended column
      // must surface it as NULL, not fail analysis
      val src = new SnapshotStreamSource(s, root, evolved, startExclusive = 0)
      val batch = src.getBatch(None, SnapshotOffset(1))
      assert(batch.isStreaming)
      assert(batch.schema.fieldNames.toSeq == Seq("tag", "i", "extra"))
    } finally rm(root)
  }

  test("streaming source: a mid-stream compaction fails loudly, never duplicates") {
    val root = tmpRoot()
    try {
      (1 to 2).foreach(k => Snapshots.publish(s, root, block(k), append = k > 1))
      val q = s.readStream.format("graft-snapshot").option("path", root.toString).load()
        .writeStream.format("memory").queryName("snapsrc_rw").outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(s.table("snapsrc_rw").count() == 200)
        Snapshots.compact(s, root, targetFiles = 1)
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
          q.awaitTermination(5000)
        }
        assert(e.getCause.getMessage.contains("not append-only"), e.getCause.getMessage)
      } finally q.stop()
    } finally rm(root)
  }

  test("streaming source: skiprewrites skips the rewrite window, then resumes adds") {
    val root = tmpRoot()
    try {
      (1 to 2).foreach(k => Snapshots.publish(s, root, block(k), append = k > 1))
      val q = s.readStream.format("graft-snapshot").option("path", root.toString)
        .option("skiprewrites", "true").load()
        .writeStream.format("memory").queryName("snapsrc_sk").outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(s.table("snapsrc_sk").count() == 200)
        // compaction rewrites both blocks into one file: with the skip
        // option the window contributes NOTHING (no duplicates) ...
        Snapshots.compact(s, root, targetFiles = 1)
        q.processAllAvailable()
        assert(s.table("snapsrc_sk").count() == 200, "rewrite window re-delivered rows")
        // ... and a clean append AFTER the rewrite window flows again
        Snapshots.publish(s, root, block(4), append = true)
        q.processAllAvailable()
        val got = s.table("snapsrc_sk").groupBy("tag").count()
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == Map(1L -> 100L, 2L -> 100L, 4L -> 100L), got.toString)
      } finally q.stop()
    } finally rm(root)
  }

  test("changefeed stream: updates and deletes deliver as retraction pairs, exactly-once across restart") {
    val root = tmpRoot()
    val out = Files.createTempDirectory("graft_cdf_out")
    val ckpt = Files.createTempDirectory("graft_cdf_ckpt")
    try {
      Snapshots.publish(s, root, keyed(100))
      def run() = s.readStream.format("graft-snapshot").option("path", root.toString)
        .option("changefeed", "true").load()
        .writeStream.format("parquet").option("path", out.toString)
        .option("checkpointLocation", ckpt.toString).start()
      def feed = s.read.schema(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("_change_type",
            org.apache.spark.sql.types.StringType))))
        .parquet(out.toString)
      val q1 = run()
      try {
        q1.processAllAvailable()
        assert(feed.count() == 100 &&
          feed.filter(col("_change_type") === "delete").count() == 0,
          "founding batch is pure inserts")
        // UPDATE keys 0..9 via upsert: old image retracted, new inserted
        val sq = s; import sq.implicits._
        Snapshots.publishUpsert(s, root,
          (0 until 10).map(i => (i.toLong, s"u$i")).toDF("k", "v"), "k")
        q1.processAllAvailable()
        val dels = feed.filter(col("_change_type") === "delete")
        assert(dels.count() == 10 &&
          dels.filter(col("v").startsWith("v")).count() == 10,
          "an update must retract exactly the OLD images")
      } finally q1.stop()
      // restart from checkpoint, then a delete-only commit
      val q2 = run()
      try {
        q2.processAllAvailable()
        assert(feed.count() == 120, "restart replayed or dropped a window")
        val sq = s; import sq.implicits._
        Snapshots.publishDeletes(s, root, Seq(0L, 50L).toDF("k"))
        q2.processAllAvailable()
      } finally q2.stop()
      // reconstructed state == the store's merged view
      val state = feed.filter(col("_change_type") === "insert").drop("_change_type")
        .exceptAll(feed.filter(col("_change_type") === "delete").drop("_change_type"))
      val want = Snapshots.readCurrent(s, root).select("k", "v")
      assert(state.exceptAll(want).isEmpty && want.exceptAll(state).isEmpty,
        "feed-tracked state diverged from the table")
      assert(state.count() == 98)
    } finally { rm(root); rm(out); rm(ckpt) }
  }

  test("changefeed stream: a rewrite window refuses loudly; skiprewrites skips it whole") {
    val root = tmpRoot()
    try {
      Snapshots.publish(s, root, keyed(100))
      val q = s.readStream.format("graft-snapshot").option("path", root.toString)
        .option("changefeed", "true").load()
        .writeStream.format("memory").queryName("cdf_rw").outputMode("append").start()
      try {
        q.processAllAvailable()
        Snapshots.compact(s, root, targetFiles = 1)
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable(); q.awaitTermination(5000)
        }
        assert(e.getCause.getMessage.contains("rewrote"), e.getCause.getMessage)
      } finally q.stop()
      // skiprewrites: the rewrite window contributes nothing; later
      // changes flow again (fresh query — the failed one is poisoned)
      val q2 = s.readStream.format("graft-snapshot").option("path", root.toString)
        .option("changefeed", "true").option("skiprewrites", "true").load()
        .writeStream.format("memory").queryName("cdf_sk").outputMode("append").start()
      try {
        q2.processAllAvailable()
        val first = s.table("cdf_sk").count() // founding state post-compact
        assert(first == 100)
        val sq = s; import sq.implicits._
        Snapshots.publishUpsert(s, root, Seq((7L, "z")).toDF("k", "v"), "k")
        q2.processAllAvailable()
        assert(s.table("cdf_sk").count() == first + 2,
          "post-rewrite change window must still deliver its retraction pair")
      } finally q2.stop()
    } finally rm(root)
  }

  test("streaming source: checkpointed restart resumes at the committed snapshot") {
    val root = tmpRoot()
    val out = Files.createTempDirectory("graft_snapsrc_out")
    val ckpt = Files.createTempDirectory("graft_snapsrc_ckpt")
    try {
      (1 to 2).foreach(k => Snapshots.publish(s, root, block(k), append = k > 1))
      def run() = s.readStream.format("graft-snapshot").option("path", root.toString).load()
        .writeStream.format("parquet").option("path", out.toString)
        .option("checkpointLocation", ckpt.toString).start()
      val q1 = run()
      try q1.processAllAvailable() finally q1.stop()
      Snapshots.publish(s, root, block(3), append = true)
      val q2 = run()
      try q2.processAllAvailable() finally q2.stop()
      val got = s.read.parquet(out.toString).groupBy("tag").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == (1 to 3).map(t => t.toLong -> 100L).toMap,
        s"restart duplicated or dropped an increment: $got")
    } finally { rm(root); rm(out); rm(ckpt) }
  }
}
