package graft.sources

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import graft.etl.Snapshots
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Changefeed mode of the DSv2 catalog streaming path:
  * `readStream.option("changefeed", true).table(...)` — the
  * ExpandChangeFeedRelation rule swaps in the feed-shaped twin, batches
  * are materialized change-data windows, tombstone windows stream as
  * insert/delete pairs, and the cache is recomputable after GC.
  */
class StreamCatalogCdfSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private var n = 0
  private def freshCatalog(): (String, Path) = {
    n += 1
    val cat = s"gcdf$n"
    val root = Files.createTempDirectory(s"graft_cdfspec$n")
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, root)
  }

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  private def drainOnce(cat: String, table: String, sink: Path): Unit = {
    val q = s.readStream.option("changefeed", "true").table(s"$cat.$table")
      .writeStream.format("parquet")
      .option("path", sink.resolve("data").toString)
      .option("checkpointLocation", sink.resolve("ckpt").toString)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
  }

  test("tombstone windows stream as insert/delete pairs (MoR DML)") {
    val (cat, root) = freshCatalog()
    val sink = Files.createTempDirectory("graft_cdfspec_sink")
    try {
      s.sql(s"CREATE TABLE $cat.kv (k BIGINT NOT NULL, v STRING) " +
        "TBLPROPERTIES ('morkey'='k')")
      // drain between commits so each DML is its own window — a single
      // drain over all three would (correctly) deliver only the NET
      // initial image, windows being snapshot-id ranges
      s.sql(s"INSERT INTO $cat.kv SELECT id, concat('v', id) FROM range(0, 100)")
      drainOnce(cat, "kv", sink)
      s.sql(s"UPDATE $cat.kv SET v = 'U' WHERE k < 10")
      drainOnce(cat, "kv", sink)
      s.sql(s"DELETE FROM $cat.kv WHERE k >= 90")
      drainOnce(cat, "kv", sink)
      val feed = s.read.parquet(sink.resolve("data").toString)
      assert(feed.columns.last == "_change_type")
      // windows (0,1] (1,2] (2,3]: 100 founding inserts, 10 update
      // pairs, 10 delete retractions
      assert(feed.filter(col("_change_type") === "insert").count() == 110)
      assert(feed.filter(col("_change_type") === "delete").count() == 20)
      val state = feed.filter(col("_change_type") === "insert").drop("_change_type")
        .exceptAll(feed.filter(col("_change_type") === "delete").drop("_change_type"))
      assert(state.count() == 90)
      assert(state.filter(col("v") === "U").count() == 10)
    } finally { rm(sink); rm(root) }
  }

  test("composite-key table: retractions carry full rows, per-line exact") {
    val (cat, root) = freshCatalog()
    val sink = Files.createTempDirectory("graft_cdfspec_sink2")
    try {
      s.sql(s"CREATE TABLE $cat.li (o BIGINT NOT NULL, line BIGINT NOT NULL, " +
        "v STRING) TBLPROPERTIES ('morkey'='o,line')")
      s.sql(s"INSERT INTO $cat.li SELECT id DIV 5, id % 5, concat('v', id) " +
        "FROM range(0, 100)")
      drainOnce(cat, "li", sink)
      s.sql(s"DELETE FROM $cat.li WHERE o = 3 AND line = 2")
      drainOnce(cat, "li", sink)
      val feed = s.read.parquet(sink.resolve("data").toString)
      val dels = feed.filter(col("_change_type") === "delete")
      assert(dels.count() == 1)
      val r = dels.select("o", "line").head
      assert(r.getLong(0) == 3 && r.getLong(1) == 2)
    } finally { rm(sink); rm(root) }
  }

  test("batch changefeed read: pinned windows, hash-matches the TVF kernel") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.kv (k BIGINT NOT NULL, v STRING) " +
        "TBLPROPERTIES ('morkey'='k')")
      s.sql(s"INSERT INTO $cat.kv SELECT id, concat('v', id) FROM range(0, 50)")
      s.sql(s"UPDATE $cat.kv SET v = 'U' WHERE k < 5")          // snapshot 2
      s.sql(s"DELETE FROM $cat.kv WHERE k >= 45")               // snapshot 3
      val store = root.resolve("kv")
      // (1,3] spans an upsert AND a delete: batch DSv2 read == TVF kernel
      val batch = s.read.option("changefeed", "true")
        .option("startsnapshot", "1").option("versionAsOf", "3")
        .table(s"$cat.kv")
      assert(batch.columns.last == "_change_type")
      val viaTvf = Snapshots.readChangeFeed(s, store, 1, 3)
        .select(batch.columns.map(col).toIndexedSeq: _*)
      assert(batch.collect().toSet == viaTvf.collect().toSet,
        "batch DSv2 changefeed diverged from the TVF window")
      assert(batch.filter(col("_change_type") === "delete").count() == 10)
      // a NEWER commit must not leak into the pinned window
      s.sql(s"INSERT INTO $cat.kv VALUES (1000, 'late')")
      val repinned = s.read.option("changefeed", "true")
        .option("startsnapshot", "1").option("versionAsOf", "3")
        .table(s"$cat.kv")
      assert(repinned.collect().toSet == viaTvf.collect().toSet,
        "VERSION AS OF pin leaked a post-pin commit into the window")
      // unpinned = (start, current]: the late insert is the only change
      val tail = s.read.option("changefeed", "true")
        .option("startsnapshot", "3").table(s"$cat.kv")
      assert(tail.collect().map(_.getString(2)).toSeq == Seq("insert"))
      // empty window (to == from) is a valid empty feed
      assert(s.read.option("changefeed", "true")
        .option("startsnapshot", "4").table(s"$cat.kv").count() == 0)
    } finally rm(root)
  }

  test("GC'd cache recomputes identically; removeOrphans ages it out") {
    val (cat, root) = freshCatalog()
    val sink = Files.createTempDirectory("graft_cdfspec_sink3")
    try {
      s.sql(s"CREATE TABLE $cat.kv (k BIGINT NOT NULL, v STRING) " +
        "TBLPROPERTIES ('morkey'='k')")
      s.sql(s"INSERT INTO $cat.kv SELECT id, concat('v', id) FROM range(0, 50)")
      s.sql(s"UPDATE $cat.kv SET v = 'U' WHERE k = 7")
      val store = root.resolve("kv")
      val cfSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType, nullable = false)))
      val first = Snapshots.changeFeedFiles(s, store, 1, 2, cfSchema)
      assert(first.nonEmpty)
      val rows1 = s.read.parquet(first.map(_.toString): _*).collect().toSet
      // age the WHOLE cache out (cutoff in the future)
      Snapshots.removeOrphans(store, System.currentTimeMillis() + 60000)
      assert(!Files.exists(store.resolve("changefeeds").resolve("1-2")))
      // a replay recomputes the identical window from immutable manifests
      val again = Snapshots.changeFeedFiles(s, store, 1, 2, cfSchema)
      val rows2 = s.read.parquet(again.map(_.toString): _*).collect().toSet
      assert(rows1 == rows2)
      // and the DATA files survived the sweep (they are referenced)
      assert(s.sql(s"SELECT count(*) FROM $cat.kv").head.getLong(0) == 50)
    } finally { rm(sink); rm(root) }
  }

  test("serving a window refreshes its mtime: GC ages by last READ") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.kv (k BIGINT NOT NULL, v STRING) " +
        "TBLPROPERTIES ('morkey'='k')")
      s.sql(s"INSERT INTO $cat.kv SELECT id, concat('v', id) FROM range(0, 20)")
      s.sql(s"UPDATE $cat.kv SET v = 'U' WHERE k = 3")
      val store = root.resolve("kv")
      val cfSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType, nullable = false)))
      assert(Snapshots.changeFeedFiles(s, store, 1, 2, cfSchema).nonEmpty)
      val dir = store.resolve("changefeeds").resolve("1-2")
      // backdate the window (a computed-long-ago cache), then SERVE it:
      // a live-but-lagging stream's read must keep the window alive
      val past = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 86400000L)
      Files.setLastModifiedTime(dir, past)
      assert(Snapshots.changeFeedFiles(s, store, 1, 2, cfSchema).nonEmpty)
      assert(Files.getLastModifiedTime(dir).toMillis > past.toMillis + 1000,
        "serve did not refresh the window's mtime")
      // a GC cutoff older than "now" but newer than the backdate now
      // spares the just-served window
      Snapshots.removeOrphans(store, System.currentTimeMillis() - 3600000L)
      assert(Files.exists(dir), "GC swept a freshly-served window")
    } finally rm(root)
  }

  test("retention guard: expire refuses to strand a registered consumer") {
    val (cat, root) = freshCatalog()
    val sink = Files.createTempDirectory("graft_cdfspec_ret")
    try {
      s.sql(s"CREATE TABLE $cat.kv (k BIGINT NOT NULL, v STRING) " +
        "TBLPROPERTIES ('morkey'='k')")
      s.sql(s"INSERT INTO $cat.kv VALUES (1, 'a')")
      s.sql(s"INSERT INTO $cat.kv VALUES (2, 'b')")
      s.sql(s"INSERT INTO $cat.kv VALUES (3, 'c')")
      val store = root.resolve("kv")
      def mkQuery() = s.readStream.option("changefeed", "true")
        .option("consumer", "mirror_a").table(s"$cat.kv")
        .writeStream.format("parquet")
        .option("path", sink.resolve("data").toString)
        .option("checkpointLocation", sink.resolve("ckpt").toString)
        .outputMode("append").start()
      // batch 0 = (0,3]: the plan-time registration pins floor 0 (a
      // kill mid-batch replays from 0); the next batch's plan advances
      // it to 3 — deterministic, no reliance on the engine's lagging
      // source.commit
      val q = mkQuery()
      try {
        q.processAllAvailable()
        s.sql(s"INSERT INTO $cat.kv VALUES (4, 'd')")
        q.processAllAvailable() // batch 1 = (3,4] planned: floor -> 3
      } finally q.stop()
      assert(Snapshots.consumerFloor(store).contains(("mirror_a", 3)))
      // the old silent data loss: expire past the consumer's floor
      // would drop manifest(3), making window (3,4] unreplayable after
      // its cache ages out — now a REFUSAL, not a convention
      val e = intercept[IllegalStateException] { Snapshots.expire(store, 4) }
      assert(e.getMessage.contains("mirror_a"))
      // expiring UP TO the consumer's floor is fine
      Snapshots.expire(store, 3)
      // the consumer restarts from its checkpoint, catches up, and its
      // floor advances: yesterday's refusal is now legal
      s.sql(s"INSERT INTO $cat.kv VALUES (5, 'e')")
      val q2 = mkQuery()
      try q2.processAllAvailable() finally q2.stop() // plans (4,5]: floor -> 4
      val feed = s.read.parquet(sink.resolve("data").toString)
      assert(feed.filter(col("_change_type") === "insert").count() == 5)
      assert(Snapshots.consumerFloor(store).contains(("mirror_a", 4)))
      Snapshots.expire(store, 4)
      intercept[IllegalStateException] { Snapshots.expire(store, 5) }
      // the SQL surfaces: the consumers metadata table lists the
      // registry, an external consumer registers by CALL, and
      // unregistering by CALL lifts the guard
      val listed = s.sql(s"SELECT name, offset FROM $cat.kv.consumers")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(listed == Seq(("mirror_a", 4L)), s"unexpected registry: $listed")
      s.sql(s"CALL $cat.system.register_consumer(tbl => 'kv', " +
        "name => 'audit_job', offset => 2)")
      // CALL expire flows through the same guard: audit_job at 2 floors it
      val eCall = intercept[Exception] {
        s.sql(s"CALL $cat.system.expire(tbl => 'kv', keep_from => 4)").collect()
      }
      assert(eCall.getMessage.contains("audit_job"))
      assert(s.sql(s"CALL $cat.system.unregister_consumer(tbl => 'kv', " +
        "name => 'audit_job')").head.getBoolean(0))
      assert(s.sql(s"CALL $cat.system.unregister_consumer(tbl => 'kv', " +
        "name => 'mirror_a')").head.getBoolean(0))
      s.sql(s"CALL $cat.system.expire(tbl => 'kv', keep_from => 5)").collect()
      assert(s.sql(s"SELECT count(*) FROM $cat.kv.consumers").head.getLong(0) == 0)
    } finally { rm(sink); rm(root) }
  }

  test("changefeed from a pinned start: startsnapshot skips prior history") {
    val (cat, root) = freshCatalog()
    val sink = Files.createTempDirectory("graft_cdfspec_sink5")
    try {
      s.sql(s"CREATE TABLE $cat.kv (k BIGINT NOT NULL, v STRING) " +
        "TBLPROPERTIES ('morkey'='k')")
      s.sql(s"INSERT INTO $cat.kv SELECT id, concat('v', id) FROM range(0, 100)")
      s.sql(s"UPDATE $cat.kv SET v = 'U' WHERE k < 10")
      // start AFTER snapshot 2: the founding inserts and the update's
      // pairs never stream; only the delete below does
      val q = s.readStream.option("changefeed", "true")
        .option("startsnapshot", "2")
        .table(s"$cat.kv")
        .writeStream.format("parquet")
        .option("path", sink.resolve("data").toString)
        .option("checkpointLocation", sink.resolve("ckpt").toString)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        s.sql(s"DELETE FROM $cat.kv WHERE k >= 95")
        q.processAllAvailable()
      } finally q.stop()
      val feed = s.read.parquet(sink.resolve("data").toString)
      assert(feed.filter(col("_change_type") === "insert").isEmpty,
        "a pinned start must not replay pre-pin inserts")
      assert(feed.filter(col("_change_type") === "delete").count() == 5)
    } finally { rm(sink); rm(root) }
  }

  test("composite-key mirror loop: changefeed -> upsert sink, zero glue") {
    val (cat, root) = freshCatalog()
    val mirror = Files.createTempDirectory("graft_cdfspec_mirror")
    val ckpt = Files.createTempDirectory("graft_cdfspec_mck")
    try {
      s.sql(s"CREATE TABLE $cat.li (o BIGINT NOT NULL, line BIGINT NOT NULL, " +
        "v STRING) TBLPROPERTIES ('morkey'='o,line')")
      s.sql(s"INSERT INTO $cat.li SELECT id DIV 5, id % 5, concat('v', id) " +
        "FROM range(0, 500)")
      def drain(): Unit = {
        val q = s.readStream.option("changefeed", "true").table(s"$cat.li")
          .writeStream.format("graft-snapshot")
          .option("path", mirror.toString)
          .option("morkey", "o,line")
          .option("applychangefeed", "true")
          .option("checkpointLocation", ckpt.toString)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      drain()
      // mutate the upstream through SQL; the mirror tracks through the
      // composite-key changefeed with no per-table glue code
      s.sql(s"UPDATE $cat.li SET v = 'U' WHERE o = 7 AND line <= 2")
      s.sql(s"DELETE FROM $cat.li WHERE o = 9")
      drain()
      s.sql(s"INSERT INTO $cat.li SELECT 1000 + id, 0, 'new' FROM range(0, 3)")
      drain()
      val src = s.table(s"$cat.li").orderBy("o", "line").collect().toSeq
      val got = Snapshots.readCurrent(s, mirror)
        .orderBy("o", "line").collect().toSeq
      assert(got == src,
        s"mirror diverged: ${got.size} vs ${src.size} rows")
      assert(src.size == 500 - 5 + 3)
      // per-LINE exactness: order 7 keeps all 5 lines, 3 updated
      assert(Snapshots.readCurrent(s, mirror)
        .filter(col("o") === 7 && col("v") === "U").count() == 3)
    } finally { rm(ckpt); rm(mirror); rm(root) }
  }
}
