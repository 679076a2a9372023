package graft.sources

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import graft.etl.Snapshots
import org.scalatest.funsuite.AnyFunSuite

/** Admission control for the snapshot streaming stacks —
  * `maxsnapshotspertrigger` / `maxbytespertrigger` on both the DSv2
  * catalog stream (SupportsAdmissionControl) and the V1 graft-snapshot
  * source (self-paced getOffset), sharing one [[SnapshotDiff.admit]]
  * kernel. The registered `stream_catalog_paced` query proves the
  * snapshot cap + Trigger.AvailableNow end-to-end; this spec pins the
  * kernel's edge semantics and the byte cap.
  */
class StreamPacingSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private var n = 0
  private def freshCatalog(): (String, Path) = {
    n += 1
    val cat = s"gpace$n"
    val root = Files.createTempDirectory(s"graft_pacespec$n")
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, root)
  }

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  test("admit: prefix-only under the snapshot cap, byte-cap progress guarantee") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT, v STRING)")
      // commits 1..4: 1 small, 2 big, 3 small, 4 small
      s.sql(s"INSERT INTO $cat.t SELECT id, 'a' FROM range(0, 10)")
      s.sql(s"INSERT INTO $cat.t SELECT id, uuid() FROM range(0, 20000)")
      s.sql(s"INSERT INTO $cat.t SELECT id, 'c' FROM range(0, 10)")
      s.sql(s"INSERT INTO $cat.t SELECT id, 'd' FROM range(0, 10)")
      val store = root.resolve("t")
      val sizes = (1 to 4).map { id =>
        Snapshots.manifest(store, id).filter(_.seq == id).map(_.bytes).sum
      }
      assert(sizes(1) > sizes(0) + sizes(2) + sizes(3), "commit 2 must dominate")
      // snapshot cap: plain prefix windows
      assert(SnapshotDiff.admit(store, 0, 4, maxSnaps = 2, maxBytes = Long.MaxValue) == 2)
      assert(SnapshotDiff.admit(store, 2, 4, maxSnaps = 2, maxBytes = Long.MaxValue) == 4)
      assert(SnapshotDiff.admit(store, 0, 4, maxSnaps = 9, maxBytes = Long.MaxValue) == 4)
      // byte cap: commit 1 fits alone; adding the big commit 2 would
      // blow the cap, so the window ends at 1 — PREFIX-only even though
      // commits 3 and 4 would individually fit
      val cap = sizes(0) + sizes(2) + sizes(3)
      assert(SnapshotDiff.admit(store, 0, 4, maxSnaps = 9, maxBytes = cap) == 1)
      // progress guarantee: from=1 the big commit alone exceeds the cap
      // but is admitted anyway (and ONLY it)
      assert(SnapshotDiff.admit(store, 1, 4, maxSnaps = 9, maxBytes = cap) == 2)
      // past the big one, the rest fits in one window
      assert(SnapshotDiff.admit(store, 2, 4, maxSnaps = 9, maxBytes = cap) == 4)
      // degenerate windows
      assert(SnapshotDiff.admit(store, 4, 4, maxSnaps = 1, maxBytes = 1L) == 4)
      assert(SnapshotDiff.admit(store, 0, 1, maxSnaps = 1, maxBytes = 1L) == 1)
    } finally rm(root)
  }

  test("DSv2 stream honors maxbytespertrigger (big commit isolated in its own batch)") {
    val (cat, root) = freshCatalog()
    val sink = Files.createTempDirectory("graft_pacespec_sink")
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT, v STRING)")
      s.sql(s"INSERT INTO $cat.t SELECT id, 'a' FROM range(0, 10)")
      s.sql(s"INSERT INTO $cat.t SELECT id, uuid() FROM range(0, 20000)")
      s.sql(s"INSERT INTO $cat.t SELECT id, 'c' FROM range(0, 10)")
      val store = root.resolve("t")
      val small = Snapshots.manifest(store, 3).filter(_.seq == 1).map(_.bytes).sum
      val q = s.readStream
        .option("maxbytespertrigger", small * 2) // commit 1 fits, 1+2 never
        .table(s"$cat.t")
        .writeStream.format("parquet")
        .option("path", sink.resolve("data").toString)
        .option("checkpointLocation", sink.resolve("ckpt").toString)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(300000L), "AvailableNow did not self-terminate")
      val windows = q.recentProgress.toIndexedSeq.filter(_.numInputRows > 0).map { p =>
        (Option(p.sources.head.startOffset).map(_.trim.toInt).getOrElse(0),
          p.sources.head.endOffset.trim.toInt)
      }
      // (0,1] small fits; (1,2] big alone (progress guarantee);
      // (2,3] the rest
      assert(windows == Seq((0, 1), (1, 2), (2, 3)), s"saw $windows")
      assert(s.read.parquet(sink.resolve("data").toString).count() == 20020)
    } finally { rm(sink); rm(root) }
  }

  test("paced consumer floors compose with expire across scheduled runs") {
    val (cat, root) = freshCatalog()
    val sink = Files.createTempDirectory("graft_pacespec_flr")
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT, v STRING)")
      (1 to 3).foreach { i =>
        s.sql(s"INSERT INTO $cat.t SELECT id, 'c$i' FROM range(${i * 10}, ${i * 10 + 10})")
      }
      val store = root.resolve("t")
      def drain(): Unit = {
        val q = s.readStream
          .option("maxsnapshotspertrigger", 1)
          .option("consumer", "lagger")
          .table(s"$cat.t")
          .writeStream.format("parquet")
          .option("path", sink.resolve("data").toString)
          .option("checkpointLocation", sink.resolve("ckpt").toString)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        assert(q.awaitTermination(300000L))
      }
      drain()
      // the floor is at least the last batch's PLAN-time start (the
      // engine commits an offset only while constructing the NEXT batch)
      val floor0 = Snapshots.consumerFloor(store).map(_._2).getOrElse(-1)
      assert(floor0 >= 2, s"paced drain left the floor at $floor0")
      // the consumer now LAGS: three more commits land while it is down
      (4 to 6).foreach { i =>
        s.sql(s"INSERT INTO $cat.t SELECT id, 'c$i' FROM range(${i * 10}, ${i * 10 + 10})")
      }
      // expiring past the lagging consumer's floor must refuse — the
      // un-replayed windows would become unreadable
      val e = intercept[IllegalStateException](Snapshots.expire(store, 6))
      assert(e.getMessage.contains("lagger"))
      // the consumer catches up (paced again); its floor advances and
      // the same expire becomes legal
      drain()
      assert(s.read.parquet(sink.resolve("data").toString).count() == 60)
      assert(Snapshots.consumerFloor(store).map(_._2).exists(_ >= 5))
      // a caught-up consumer releases history up to its floor
      Snapshots.expire(store, Snapshots.consumerFloor(store).get._2)
      ()
    } finally { rm(sink); rm(root) }
  }

  test("lag and sink metrics ride the progress log (ReportsSource/SinkMetrics)") {
    val (cat, root) = freshCatalog()
    val ckpt = Files.createTempDirectory("graft_pacespec_met")
    try {
      s.sql(s"CREATE TABLE $cat.src (k BIGINT, v STRING)")
      s.sql(s"CREATE TABLE $cat.dst (k BIGINT, v STRING)")
      (1 to 4).foreach { i =>
        s.sql(s"INSERT INTO $cat.src SELECT id, 'c$i' FROM range(${i * 10}, ${i * 10 + 10})")
      }
      val q = s.readStream
        .option("maxsnapshotspertrigger", 1)
        .table(s"$cat.src")
        .writeStream.option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable(s"$cat.dst")
      assert(q.awaitTermination(300000L))
      val ps = q.recentProgress.toIndexedSeq.filter(_.numInputRows > 0)
      assert(ps.size == 4)
      // the source reports its LAG per batch: strictly shrinking commit
      // and byte backlogs, 0 when the final batch's progress is cut
      val lags = ps.map(_.sources.head.metrics.get("pendingSnapshots").toLong)
      assert(lags.last == 0L && lags == lags.sorted.reverse,
        s"pendingSnapshots must shrink to 0 across the drain: $lags")
      assert(ps.map(_.sources.head.metrics.get("pendingBytes").toLong).last == 0L)
      // the sink reports WHICH table version each epoch produced
      val sm = ps.last.sink.metrics
      assert(sm.get("snapshotId") == "4" && sm.get("lastBatchId") == "3",
        s"sink metrics off: $sm")
    } finally { rm(ckpt); rm(root) }
  }

  test("V1 graft-snapshot source self-paces getOffset under the snapshot cap") {
    val root = Files.createTempDirectory("graft_pacespec_v1")
    val sink = Files.createTempDirectory("graft_pacespec_v1sink")
    try {
      import s.implicits._
      val store = root.resolve("t")
      (1 to 5).foreach { k =>
        Snapshots.publish(s, store,
          Seq((k.toLong, s"v$k")).toDF("k", "v"), append = k > 1)
      }
      val q = s.readStream.format("graft-snapshot")
        .option("path", store.toString)
        .option("maxsnapshotspertrigger", 2)
        .load()
        .writeStream.format("parquet")
        .option("path", sink.resolve("data").toString)
        .option("checkpointLocation", sink.resolve("ckpt").toString)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val windows = q.recentProgress.toIndexedSeq.filter(_.numInputRows > 0).map { p =>
        (Option(p.sources.head.startOffset).map(_.trim.toInt).getOrElse(0),
          p.sources.head.endOffset.trim.toInt)
      }
      assert(windows.nonEmpty && windows.forall { case (a, b) => b - a <= 2 },
        s"V1 pacing violated the 2-commit cap: $windows")
      assert(windows.map { case (a, b) => b - a }.sum == 5,
        s"windows must cover all 5 commits exactly once: $windows")
      assert(s.read.parquet(sink.resolve("data").toString).count() == 5)
    } finally { rm(sink); rm(root) }
  }
}
