package graft.sources

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import graft.etl.Snapshots
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The UPSERT streaming sink (`morkey` option, r14) and its layer-side
  * commit [[Snapshots.publishUpsertBatch]]: one atomic tombstone+rows
  * merge-on-read commit per micro-batch, exactly-once by the batch id
  * riding the pointer rename; the `applychangefeed` mode collapses a
  * change-feed window (insert rows upsert, delete-only keys tombstone)
  * so `changefeed source -> upsert sink` maintains a mirror of a
  * mutating table with no foreachBatch glue.
  */
class UpsertSinkSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  import s.implicits._

  private def tmp(tag: String): Path = Files.createTempDirectory(s"graft_ups_$tag")

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  private def kv(pairs: (Long, String)*) =
    pairs.toDF("k", "v")

  test("publishUpsertBatch: FOUNDING batch refuses duplicate keys too") {
    val root = tmp("founddup")
    try {
      // a key duplicated in the founding batch and never touched again
      // would live as two rows forever — the gate must bind from birth
      val e = intercept[IllegalArgumentException] {
        Snapshots.publishUpsertBatch(s, root, kv(1L -> "a", 1L -> "b"), "k", 0L)
      }
      assert(e.getMessage.contains("more than once"))
      assert(Snapshots.currentId(root).isEmpty, "refused batch founded the table")
      // the clean retry founds normally
      assert(Snapshots.publishUpsertBatch(s, root, kv(1L -> "a", 2L -> "b"), "k", 0L))
      assert(Snapshots.readCurrent(s, root).count() == 2)
    } finally rm(root)
  }

  test("publishUpsertBatch: founding, upsert, delete-only, empty batches") {
    val root = tmp("layer")
    try {
      // founding batch: lands rows, no tombstone target exists
      assert(Snapshots.publishUpsertBatch(s, root, kv(1L -> "a", 2L -> "b"), "k", 0L))
      assert(Snapshots.currentId(root).contains(1))
      // upsert batch: key 2 re-lands, key 3 inserts
      assert(Snapshots.publishUpsertBatch(s, root, kv(2L -> "B", 3L -> "c"), "k", 1L))
      val st1 = Snapshots.readCurrent(s, root).as[(Long, String)].collect().toMap
      assert(st1 == Map(1L -> "a", 2L -> "B", 3L -> "c"))
      // delete-only batch: no rows, just keys
      assert(Snapshots.publishUpsertBatch(s, root, kv().limit(0), Seq("k"), 2L,
        deleteKeys = Some(Seq(1L).toDF("k"))))
      val st2 = Snapshots.readCurrent(s, root).as[(Long, String)].collect().toMap
      assert(st2 == Map(2L -> "B", 3L -> "c"))
      // empty batch: watermark advances, snapshot unchanged
      val snapBefore = Snapshots.currentId(root).get
      assert(Snapshots.publishUpsertBatch(s, root, kv().limit(0), "k", 3L))
      assert(Snapshots.currentId(root).contains(snapBefore))
      assert(Snapshots.lastBatchId(root).contains(3L))
      // replayed batch ids are no-ops at every shape
      assert(!Snapshots.publishUpsertBatch(s, root, kv(9L -> "x"), "k", 3L))
      assert(Snapshots.readCurrent(s, root).count() == 2)
    } finally rm(root)
  }

  test("a batch carrying one key twice refuses loudly") {
    val root = tmp("dup")
    try {
      assert(Snapshots.publishUpsertBatch(s, root, kv(1L -> "a"), "k", 0L))
      val e = intercept[IllegalArgumentException] {
        Snapshots.publishUpsertBatch(s, root, kv(2L -> "x", 2L -> "y"), "k", 1L)
      }
      assert(e.getMessage.contains("more than once"))
      // nothing committed, watermark unmoved: the batch stays re-deliverable
      assert(Snapshots.lastBatchId(root).contains(0L))
    } finally rm(root)
  }

  test("upsert sink: Update-mode stateful aggregation maintains a table") {
    val root = tmp("sink")
    val src = tmp("sinksrc")
    val ckpt = tmp("sinkck")
    try {
      // two waves of events; the running per-key count is Update-mode
      // output — exactly the one-row-per-changed-key shape the sink wants
      Seq((1L, 10L), (2L, 20L)).toDF("k", "amt")
        .coalesce(1).write.mode("append").parquet(src.toString)
      def run(): Unit = {
        val q = s.readStream.schema("k LONG, amt LONG")
          .parquet(src.toString)
          .groupBy("k").agg(sum("amt").as("total"))
          .writeStream.format("graft-snapshot")
          .option("path", root.toString).option("morkey", "k")
          .option("checkpointLocation", ckpt.toString)
          .outputMode("update").start()
        try q.processAllAvailable() finally q.stop()
      }
      run()
      assert(Snapshots.readCurrent(s, root).as[(Long, Long)].collect().toMap ==
        Map(1L -> 10L, 2L -> 20L))
      Seq((1L, 5L), (3L, 30L)).toDF("k", "amt")
        .coalesce(1).write.mode("append").parquet(src.toString)
      run()
      // key 1's re-emission SUPERSEDED its old row (an append sink would
      // have kept both); key 2 untouched; key 3 inserted
      assert(Snapshots.readCurrent(s, root).as[(Long, Long)].collect().toMap ==
        Map(1L -> 15L, 2L -> 20L, 3L -> 30L))
    } finally { rm(ckpt); rm(src); rm(root) }
  }

  test("changefeed -> upsert sink mirrors updates and deletes") {
    val up = tmp("mirup")
    val mir = tmp("mirdown")
    val ckpt = tmp("mirck")
    try {
      Snapshots.publish(s, up, kv(1L -> "a", 2L -> "b", 3L -> "c"))
      def run(): Unit = {
        val q = s.readStream.format("graft-snapshot")
          .option("path", up.toString).option("changefeed", "true").load()
          .writeStream.format("graft-snapshot")
          .option("path", mir.toString).option("morkey", "k")
          .option("applychangefeed", "true")
          .option("checkpointLocation", ckpt.toString).start()
        try q.processAllAvailable() finally q.stop()
      }
      run()
      assert(Snapshots.readCurrent(s, mir).as[(Long, String)].collect().toMap ==
        Map(1L -> "a", 2L -> "b", 3L -> "c"))
      // upstream churn: update 2, delete 1, insert 4 — two commits
      Snapshots.publishUpsert(s, up, kv(2L -> "B", 4L -> "d"), "k")
      Snapshots.publishDeletes(s, up, Seq(1L).toDF("k"))
      run() // checkpointed restart consumes both windows
      assert(Snapshots.readCurrent(s, mir).as[(Long, String)].collect().toMap ==
        Map(2L -> "B", 3L -> "c", 4L -> "d"))
      // the mirror tracked the upstream exactly
      assert(Snapshots.readCurrent(s, mir)
        .exceptAll(Snapshots.readCurrent(s, up)).isEmpty)
    } finally { rm(ckpt); rm(mir); rm(up) }
  }

  test("maintenance interleaves with the sink: compaction between batches survives") {
    val root = tmp("maint")
    try {
      assert(Snapshots.publishUpsertBatch(s, root,
        (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v"), "k", 0L))
      assert(Snapshots.publishUpsertBatch(s, root,
        kv(1L -> "A", 101L -> "x"), "k", 1L))
      // CALL system.compact's kernel lands between two sink batches:
      // tombstones fold away, files merge, the batch watermark survives
      Snapshots.compactOcc(s, root, targetFiles = 1)
      assert(Snapshots.lastBatchId(root).contains(1L),
        "compaction must carry the replay watermark forward")
      val compacted = Snapshots.currentId(root).get
      assert(!Snapshots.manifest(root, compacted).exists(Snapshots.isDelete))
      // the next sink batch REBASES onto the compacted manifest: the
      // compacted file is carried, not orphaned
      assert(Snapshots.publishUpsertBatch(s, root, kv(2L -> "B"), "k", 2L))
      val now = Snapshots.manifest(root, Snapshots.currentId(root).get)
      val carried = Snapshots.manifest(root, compacted).map(_.relPath).toSet
      assert(carried.subsetOf(now.map(_.relPath).toSet),
        "sink commit after compaction must carry the compacted files")
      val st = Snapshots.readCurrent(s, root).as[(Long, String)].collect().toMap
      assert(st.size == 101 && st(1L) == "A" && st(2L) == "B" && st(101L) == "x")
      // a replay of batch 2 after all of that is still a no-op
      assert(!Snapshots.publishUpsertBatch(s, root, kv(2L -> "Z"), "k", 2L))
      assert(Snapshots.readCurrent(s, root).as[(Long, String)].collect().toMap.apply(2L) == "B")
    } finally rm(root)
  }

  test("mode and option misuse refuses loudly") {
    val root = tmp("refuse")
    val ckpt = tmp("refuseck")
    try {
      // Update mode without morkey: the append sink must refuse
      val e1 = intercept[Exception] {
        val q = s.readStream.format("rate").option("rowsPerSecond", 1).load()
          .groupBy("value").count()
          .writeStream.format("graft-snapshot")
          .option("path", root.toString)
          .option("checkpointLocation", ckpt.resolve("a").toString)
          .outputMode("update").start()
        try q.processAllAvailable() finally q.stop()
      }
      assert(e1.getMessage.contains("morkey") ||
        Option(e1.getCause).exists(_.getMessage.contains("morkey")))
      // applychangefeed without a _change_type column refuses per-batch
      val e2 = intercept[Exception] {
        val q = s.readStream.format("rate").option("rowsPerSecond", 1).load()
          .writeStream.format("graft-snapshot")
          .option("path", root.toString).option("morkey", "value")
          .option("applychangefeed", "true")
          .option("checkpointLocation", ckpt.resolve("b").toString)
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      val msgs = Iterator.iterate(e2: Throwable)(_.getCause).takeWhile(_ != null)
        .take(6).map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains("_change_type"))
    } finally { rm(ckpt); rm(root) }
  }
}
