package graft.sources

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import graft.etl.Snapshots
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 STREAMING writes into catalog tables (`writeStream.toTable`):
  * epoch-dir staging, layout-true clustered epochs on partitioned and
  * bucketed tables, upsert-per-epoch on `morkey` tables (update-mode
  * output as append — the continuously-maintained materialized view),
  * complete-mode whole-table replace, and the layer's batch-id replay
  * contract end-to-end across a checkpointed restart.
  */
class GraftStreamingWriteSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private var n = 0
  private def freshCatalog(): (String, Path) = {
    n += 1
    val cat = s"gsw$n"
    val root = Files.createTempDirectory(s"graft_gswspec$n")
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, root)
  }

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  test("plain append toTable: paced epochs, exactly-once across restart") {
    val (cat, root) = freshCatalog()
    val ckpt = Files.createTempDirectory("graft_gsw_ckpt")
    try {
      s.sql(s"CREATE TABLE $cat.src (k BIGINT, v STRING)")
      s.sql(s"CREATE TABLE $cat.dst (k BIGINT, v STRING)")
      (0 until 3).foreach { i =>
        s.sql(s"INSERT INTO $cat.src SELECT id, concat('v', id) FROM range(${i * 100}, ${i * 100 + 100})")
      }
      def run(): Unit = {
        val q = s.readStream
          .option("maxsnapshotspertrigger", 1)
          .table(s"$cat.src")
          .writeStream
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .toTable(s"$cat.dst")
        assert(q.awaitTermination(300000L))
      }
      run()
      // one snapshot per admitted source commit: 3 epochs = 3 commits
      assert(Snapshots.currentId(root.resolve("dst")).contains(3))
      assert(s.table(s"$cat.dst").count() == 300)
      // a replayed epoch must be a no-op: re-running over the same
      // checkpoint with no new upstream data commits nothing
      run()
      assert(Snapshots.currentId(root.resolve("dst")).contains(3))
      // new upstream commit, restart: exactly the increment arrives
      s.sql(s"INSERT INTO $cat.src SELECT id, 'late' FROM range(1000, 1010)")
      run()
      assert(s.table(s"$cat.dst").count() == 310)
      assert(s.table(s"$cat.dst").filter(col("v") === "late").count() == 10)
      // exactly-once: no key duplicated
      assert(s.sql(s"SELECT max(c) FROM (SELECT count(*) c FROM $cat.dst GROUP BY k)")
        .head.getLong(0) == 1L)
    } finally { rm(ckpt); rm(root) }
  }

  test("partitioned table: streamed epochs land value-pure _pv= files") {
    val (cat, root) = freshCatalog()
    val ckpt = Files.createTempDirectory("graft_gsw_ckpt2")
    try {
      s.sql(s"CREATE TABLE $cat.src (k BIGINT, grp BIGINT)")
      s.sql(s"CREATE TABLE $cat.dst (k BIGINT, grp BIGINT) PARTITIONED BY (grp)")
      s.sql(s"INSERT INTO $cat.src SELECT id, id % 4 FROM range(0, 1000)")
      val q = s.readStream.table(s"$cat.src")
        .writeStream.option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .toTable(s"$cat.dst")
      assert(q.awaitTermination(300000L))
      val store = root.resolve("dst")
      val entries = Snapshots.manifest(store, Snapshots.currentId(store).get)
      assert(entries.nonEmpty)
      // every streamed file is value-pure: a _pv= segment names its value
      assert(entries.forall(e => Snapshots.partValueOf(e.relPath).isDefined),
        s"non-value-pure streamed files: ${entries.map(_.relPath).take(3)}")
      assert(entries.flatMap(e => Snapshots.partValueOf(e.relPath)).toSet ==
        Set("0", "1", "2", "3"))
      assert(s.table(s"$cat.dst").filter(col("grp") === 2).count() == 250)
    } finally { rm(ckpt); rm(root) }
  }

  test("morkey table: update-mode aggregation streams as upserts (matview)") {
    val (cat, root) = freshCatalog()
    val ckpt = Files.createTempDirectory("graft_gsw_ckpt3")
    try {
      s.sql(s"CREATE TABLE $cat.src (k BIGINT, amt BIGINT)")
      s.sql(s"CREATE TABLE $cat.agg (k BIGINT NOT NULL, total BIGINT, nrows BIGINT) " +
        "TBLPROPERTIES ('morkey'='k')")
      s.sql(s"INSERT INTO $cat.src SELECT id % 10, id FROM range(0, 100)")
      def run(): Unit = {
        val q = s.readStream.table(s"$cat.src")
          .groupBy(col("k"))
          .agg(sum(col("amt")).as("total"), count(lit(1)).as("nrows"))
          .writeStream
          .option("checkpointLocation", ckpt.toString)
          .outputMode("update")
          .trigger(Trigger.AvailableNow())
          .toTable(s"$cat.agg")
        assert(q.awaitTermination(300000L))
      }
      run()
      assert(s.table(s"$cat.agg").count() == 10)
      // second upstream commit shifts every key's aggregate; the epoch
      // must UPSERT (tombstone the old images), not append beside them
      s.sql(s"INSERT INTO $cat.src SELECT id % 5, id * 1000 FROM range(0, 50)")
      run()
      val out = s.table(s"$cat.agg")
      assert(out.count() == 10, "one row per key after re-aggregation")
      val k3 = out.filter(col("k") === 3).head
      // k=3: batch1 rows 3,13,...,93 (sum 480, n 10); batch2 adds
      // ids 3,8,...,48 step 5 → 3000,8000,...,48000 (sum 255000, n 10)
      assert(k3.getLong(1) == 480L + 255000L && k3.getLong(2) == 20L)
      // physically merge-on-read: tombstones present pre-compact
      val store = root.resolve("agg")
      assert(Snapshots.manifest(store, Snapshots.currentId(store).get)
        .exists(Snapshots.isDelete))
    } finally { rm(ckpt); rm(root) }
  }

  test("complete mode: each epoch replaces the table (streaming matview, keyless)") {
    val (cat, root) = freshCatalog()
    val ckpt = Files.createTempDirectory("graft_gsw_ckpt4")
    try {
      s.sql(s"CREATE TABLE $cat.src (k BIGINT)")
      s.sql(s"CREATE TABLE $cat.cnt (k BIGINT, n BIGINT)")
      s.sql(s"INSERT INTO $cat.src SELECT id % 3 FROM range(0, 90)")
      def run(): Unit = {
        val q = s.readStream.table(s"$cat.src")
          .groupBy(col("k")).agg(count(lit(1)).as("n"))
          .writeStream.option("checkpointLocation", ckpt.toString)
          .outputMode("complete")
          .trigger(Trigger.AvailableNow())
          .toTable(s"$cat.cnt")
        assert(q.awaitTermination(300000L))
      }
      run()
      assert(s.table(s"$cat.cnt").count() == 3)
      s.sql(s"INSERT INTO $cat.src SELECT 7 FROM range(0, 5)")
      run()
      val rows = s.table(s"$cat.cnt").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(rows == Map(0L -> 30L, 1L -> 30L, 2L -> 30L, 7L -> 5L))
      // a REPLACE, not an accumulation: exactly 4 rows, old epoch gone
      assert(s.table(s"$cat.cnt").count() == 4)
    } finally { rm(ckpt); rm(root) }
  }

  test("bucketed sorted table: streamed epochs stay bucket-pure and sorted") {
    val (cat, root) = freshCatalog()
    val ckpt = Files.createTempDirectory("graft_gsw_ckpt5")
    try {
      s.sql(s"CREATE TABLE $cat.src (k BIGINT, ord BIGINT)")
      s.sql(s"CREATE TABLE $cat.dst (k BIGINT, ord BIGINT NOT NULL) " +
        "PARTITIONED BY (bucket(4, k)) TBLPROPERTIES ('sortcol'='ord')")
      s.sql(s"INSERT INTO $cat.src SELECT id, 10000 - id FROM range(0, 5000)")
      val q = s.readStream.table(s"$cat.src")
        .writeStream.option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .toTable(s"$cat.dst")
      assert(q.awaitTermination(300000L))
      val store = root.resolve("dst")
      val entries = Snapshots.manifest(store, Snapshots.currentId(store).get)
      assert(entries.flatMap(e => Snapshots.partValueOf(e.relPath)).toSet ==
        Set("0", "1", "2", "3"))
      assert(s.table(s"$cat.dst").count() == 5000)
      // the engine-planned in-batch sort held: every file's rows are
      // ascending in ord (the writer REFUSES out-of-order rows, so the
      // mere existence of the snapshot proves it — spot-check anyway)
      val one = s.read.parquet(
        store.resolve(entries.head.relPath).toString).select("ord").collect()
        .map(_.getLong(0))
      assert(one.sameElements(one.sorted))
    } finally { rm(ckpt); rm(root) }
  }

  test("'autoexpire' bounds a complete-mode matview's snapshot history") {
    val (cat, root) = freshCatalog()
    val ckpt = Files.createTempDirectory("graft_gsw_ckpt7")
    try {
      s.sql(s"CREATE TABLE $cat.src (k BIGINT)")
      // a continuously-rewritten matview pins one full table copy per
      // epoch; the dial keeps only the newest K snapshots
      s.sql(s"CREATE TABLE $cat.cnt (k BIGINT, n BIGINT) " +
        "TBLPROPERTIES ('autoexpire'='2')")
      def run(): Unit = {
        val q = s.readStream.table(s"$cat.src")
          .groupBy(col("k")).agg(count(lit(1)).as("n"))
          .writeStream.option("checkpointLocation", ckpt.toString)
          .outputMode("complete")
          .trigger(Trigger.AvailableNow())
          .toTable(s"$cat.cnt")
        assert(q.awaitTermination(300000L))
      }
      (1 to 3).foreach { i =>
        s.sql(s"INSERT INTO $cat.src SELECT id % 3 FROM range(0, ${i * 30})")
        run()
      }
      val store = root.resolve("cnt")
      assert(Snapshots.currentId(store).contains(3))
      // history is BOUNDED: snapshot 1's manifest and files are gone...
      val e = intercept[Exception](
        s.sql(s"SELECT * FROM $cat.cnt VERSION AS OF 1").collect())
      assert(e != null)
      // ...while the kept window still time-travels
      assert(s.sql(s"SELECT sum(n) FROM $cat.cnt VERSION AS OF 2")
        .head.getLong(0) == 90L)
      assert(s.sql(s"SELECT sum(n) FROM $cat.cnt").head.getLong(0) == 180L)
      // storage bound, not just metadata: only the kept epochs' files
      // remain on disk
      val walk = Files.walk(store.resolve("data"))
      val live = try walk.iterator().asScala.count(
        _.getFileName.toString.endsWith(".parquet")) finally walk.close()
      assert(live <= 6, s"expired epochs left $live files on disk")
    } finally { rm(ckpt); rm(root) }
  }

  test("'writedistribution'='none' partitioned table refuses streaming writes") {
    val (cat, root) = freshCatalog()
    val ckpt = Files.createTempDirectory("graft_gsw_ckpt6")
    try {
      s.sql(s"CREATE TABLE $cat.src (k BIGINT, grp BIGINT)")
      s.sql(s"CREATE TABLE $cat.dst (k BIGINT, grp BIGINT) PARTITIONED BY (grp) " +
        "TBLPROPERTIES ('writedistribution'='none')")
      s.sql(s"INSERT INTO $cat.src SELECT id, id % 2 FROM range(0, 10)")
      val e = intercept[Exception] {
        val q = s.readStream.table(s"$cat.src")
          .writeStream.option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .toTable(s"$cat.dst")
        q.awaitTermination(300000L)
      }
      // the V1 legs have no streaming face — any failure here must be
      // loud, never a silently-empty sink
      assert(s.table(s"$cat.dst").count() == 0)
      assert(e != null)
    } finally { rm(ckpt); rm(root) }
  }
}
