package graft.sources

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import graft.etl.Snapshots
import org.scalatest.funsuite.AnyFunSuite

/** Edge contracts of `CALL system.compact_partitions` (the selective
  * small-file binpack) and the value-pure full compact on
  * identity-partitioned tables. The happy path, zero-amplification
  * manifest proof and idempotence are oracled end-to-end in the
  * registered `catalog_compact_small` query.
  */
class CompactPartitionsSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private var n = 0
  private def freshCatalog(): (String, Path) = {
    n += 1
    val cat = s"gcps$n"
    val root = Files.createTempDirectory(s"graft_cpsspec$n")
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, root)
  }

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  test("refuses flat tables, bad thresholds, live tombstones") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.flat (k BIGINT, v STRING)")
      s.sql(s"INSERT INTO $cat.flat SELECT id, 'a' FROM range(0, 10)")
      val eFlat = intercept[Exception](
        s.sql(s"CALL $cat.system.compact_partitions(tbl => 'flat', min_files => 2)"))
      assert(eFlat.getMessage.contains("PARTITIONED"))
      s.sql(s"CREATE TABLE $cat.p (k BIGINT, g BIGINT) PARTITIONED BY (g)")
      s.sql(s"INSERT INTO $cat.p SELECT id, id % 2 FROM range(0, 10)")
      val eMin = intercept[Exception](
        s.sql(s"CALL $cat.system.compact_partitions(tbl => 'p', min_files => 1)"))
      assert(eMin.getMessage.contains("min_files"))
      // live tombstones: selective carry cannot attribute rows — refuse
      s.sql(s"CREATE TABLE $cat.m (k BIGINT NOT NULL, g BIGINT) " +
        "PARTITIONED BY (g) TBLPROPERTIES ('morkey'='k')")
      (0 until 3).foreach { _ =>
        s.sql(s"INSERT INTO $cat.m SELECT id, id % 2 FROM range(0, 10)")
      }
      s.sql(s"DELETE FROM $cat.m WHERE k < 3")
      val eTomb = intercept[Exception](
        s.sql(s"CALL $cat.system.compact_partitions(tbl => 'm', min_files => 2)"))
      assert(eTomb.getMessage.contains("tombstone"))
    } finally rm(root)
  }

  test("string partition values compact selectively and stay value-pure") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT, lang STRING) PARTITIONED BY (lang)")
      (0 until 4).foreach { i =>
        s.sql(s"INSERT INTO $cat.t SELECT id + ${i * 100}, 'en' FROM range(0, 50)")
      }
      s.sql(s"INSERT INTO $cat.t SELECT id, 'de' FROM range(0, 50)")
      val store = root.resolve("t")
      val res = s.sql(s"CALL $cat.system.compact_partitions(tbl => 't', " +
        "min_files => 3)").head
      assert(res.getInt(0) == 1 && res.getInt(2) == 2, s"got $res")
      val after = Snapshots.manifest(store, Snapshots.currentId(store).get)
      assert(after.flatMap(e => Snapshots.partValueOf(e.relPath)).toSet ==
        Set("en", "de"))
      assert(after.count(e => Snapshots.partValueOf(e.relPath).contains("en")) == 1)
      assert(s.table(s"$cat.t").count() == 250)
      assert(s.table(s"$cat.t").filter(org.apache.spark.sql.functions
        .col("lang") === "en").count() == 200)
    } finally rm(root)
  }

  test("bucketed tables compact selectively too, sorted claim restored") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.b (k BIGINT, ord BIGINT NOT NULL) " +
        "PARTITIONED BY (bucket(2, k)) TBLPROPERTIES ('sortcol'='ord')")
      // four appends fragment both buckets; then one append hits ONLY
      // bucket pmod(hash(0),2) rows (k=0 constant)
      (0 until 4).foreach { i =>
        s.sql(s"INSERT INTO $cat.b SELECT id, id + ${i * 1000} FROM range(0, 100)")
      }
      s.sql(s"INSERT INTO $cat.b SELECT 0, 9000 + id FROM range(0, 10)")
      val store = root.resolve("b")
      val before = Snapshots.manifest(store, Snapshots.currentId(store).get)
      val perVal = before.groupBy(e => Snapshots.partValueOf(e.relPath).get)
        .view.mapValues(_.size).toMap
      assert(perVal.values.max == 5 && perVal.values.min == 4, s"setup: $perVal")
      val res = s.sql(s"CALL $cat.system.compact_partitions(tbl => 'b', " +
        "min_files => 4)").head
      assert(res.getInt(0) == 1, s"expected exactly the 5-file bucket rewritten: $res")
      val after = Snapshots.manifest(store, Snapshots.currentId(store).get)
      val hotVal = perVal.maxBy(_._2)._1
      assert(after.count(e => Snapshots.partValueOf(e.relPath).contains(hotVal)) == 1)
      // carried bucket untouched byte-for-byte
      val coldIds = before.filterNot(e =>
        Snapshots.partValueOf(e.relPath).contains(hotVal))
        .map(e => (e.relPath, e.md5)).toSet
      assert(after.count(e => coldIds((e.relPath, e.md5))) == coldIds.size)
      // the rewritten bucket's single file is ascending in ord (the
      // sorted stager restored the ordering claim)
      val hotFile = after.find(e =>
        Snapshots.partValueOf(e.relPath).contains(hotVal)).get
      val ords = s.read.parquet(store.resolve(hotFile.relPath).toString)
        .select("ord").collect().map(_.getLong(0))
      assert(ords.sameElements(ords.sorted))
      assert(s.table(s"$cat.b").count() == 410)
    } finally rm(root)
  }

  test("'autocompact' dial: the streaming sink self-heals its fragmentation") {
    val (cat, root) = freshCatalog()
    val ckpt = Files.createTempDirectory("graft_cps_auto")
    try {
      s.sql(s"CREATE TABLE $cat.src (k BIGINT, g BIGINT)")
      s.sql(s"CREATE TABLE $cat.dst (k BIGINT, g BIGINT) PARTITIONED BY (g) " +
        "TBLPROPERTIES ('autocompact'='3')")
      (0 until 6).foreach { i =>
        s.sql(s"INSERT INTO $cat.src SELECT id + ${i * 1000}, id % 2 FROM range(0, 100)")
      }
      val q = s.readStream.option("maxsnapshotspertrigger", 1)
        .table(s"$cat.src")
        .writeStream.option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable(s"$cat.dst")
      assert(q.awaitTermination(300000L))
      val store = root.resolve("dst")
      // per-epoch growth: 1,2,3,4 -> auto-fold to 1 -> 2,3; the manifest
      // never exceeds the dial for long and ends bounded
      val after = Snapshots.manifest(store, Snapshots.currentId(store).get)
      val perVal = after.groupBy(e => Snapshots.partValueOf(e.relPath).get)
        .view.mapValues(_.size).toMap
      assert(perVal.values.max <= 3, s"sink did not self-heal: $perVal")
      // 6 epochs + 1 auto-compaction commit
      assert(Snapshots.currentId(store).contains(7),
        s"expected 7 snapshots (6 epochs + 1 fold), saw ${Snapshots.currentId(store)}")
      // exactly-once held THROUGH the in-sink maintenance (the
      // compaction commit carries the batch watermark)
      assert(s.table(s"$cat.dst").count() == 600)
      assert(s.sql(s"SELECT max(c) FROM (SELECT count(*) c FROM $cat.dst GROUP BY k)")
        .head.getLong(0) == 1L)
    } finally { rm(ckpt); rm(root) }
  }

  test("streamed epochs fragment; compact_partitions folds them; stream resumes") {
    val (cat, root) = freshCatalog()
    val ckpt = Files.createTempDirectory("graft_cps_ckpt")
    try {
      s.sql(s"CREATE TABLE $cat.src (k BIGINT, g BIGINT)")
      s.sql(s"CREATE TABLE $cat.dst (k BIGINT, g BIGINT) PARTITIONED BY (g)")
      def drain(): Unit = {
        val q = s.readStream.option("maxsnapshotspertrigger", 1)
          .table(s"$cat.src")
          .writeStream.option("checkpointLocation", ckpt.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .toTable(s"$cat.dst")
        assert(q.awaitTermination(300000L))
      }
      (0 until 5).foreach { i =>
        s.sql(s"INSERT INTO $cat.src SELECT id + ${i * 1000}, id % 2 FROM range(0, 100)")
      }
      drain() // 5 paced epochs -> 5 files per partition value
      val store = root.resolve("dst")
      val before = Snapshots.manifest(store, Snapshots.currentId(store).get)
      assert(before.size == 10)
      val res = s.sql(s"CALL $cat.system.compact_partitions(tbl => 'dst', " +
        "min_files => 3)").head
      assert(res.getInt(0) == 2 && res.getInt(2) == 2, s"got $res")
      // the stream keeps going after maintenance: a new upstream commit
      // drains into the compacted table (the compaction snapshot carried
      // the batch watermark, so the epoch replay contract held)
      s.sql(s"INSERT INTO $cat.src SELECT id + 9000, id % 2 FROM range(0, 10)")
      drain()
      assert(s.table(s"$cat.dst").count() == 510)
      assert(s.sql(s"SELECT max(c) FROM (SELECT count(*) c FROM $cat.dst GROUP BY k)")
        .head.getLong(0) == 1L)
    } finally { rm(ckpt); rm(root) }
  }
}
