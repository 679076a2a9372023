package graft.sources

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import graft.etl.Snapshots
import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read row-level DML through SQL (`morkey` tables,
  * [[GraftDeltaOperation]]): UPDATE/DELETE/MERGE land as equality-delete
  * tombstones + replacement rows in ONE commit with NO base data file
  * rewritten; tombstone-bearing snapshots are served via the merged
  * read; compaction folds the deltas physically and returns the table
  * to the pure-DSv2 scan path.
  */
class GraftDeltaSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private var n = 0
  private def freshCatalog(): (String, Path) = {
    n += 1
    val cat = s"gdel$n"
    val root = Files.createTempDirectory(s"graft_delta$n")
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, root)
  }

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  private def morTable(cat: String, rows: Int = 1000): String = {
    s.sql(s"CREATE TABLE $cat.kv (k BIGINT NOT NULL, v STRING, cents BIGINT) " +
      "TBLPROPERTIES ('morkey'='k')")
    s.sql(s"INSERT INTO $cat.kv SELECT id, concat('v', id), id * 10 FROM range(0, $rows)")
    s"$cat.kv"
  }

  test("MoR UPDATE: O(changed rows) delta commit, zero base files rewritten") {
    val (cat, root) = freshCatalog()
    try {
      val t = morTable(cat)
      val store = root.resolve("kv")
      val base = Snapshots.manifest(store, 1)
      s.sql(s"UPDATE $t SET cents = cents + 1, v = 'U' WHERE k BETWEEN 100 AND 109")
      assert(Snapshots.currentId(store).contains(2), "UPDATE must land ONE commit")
      val after = Snapshots.manifest(store, 2)
      // every base entry carried byte-identical with its original seq
      base.foreach(b => assert(after.exists(e =>
        e.relPath == b.relPath && e.md5 == b.md5 && e.seq == b.seq),
        s"base file ${b.relPath} was rewritten by a MoR UPDATE"))
      val fresh = after.filterNot(e => base.exists(_.relPath == e.relPath))
      val (tombs, datas) = fresh.partition(Snapshots.isDelete)
      assert(tombs.nonEmpty && datas.nonEmpty,
        s"expected tombstone + replacement rows, got $fresh")
      // the delta is SMALL: tombstone holds 10 keys, data holds 10 rows
      assert(s.read.parquet(store.resolve(tombs.head.relPath).toString).count() == 10)
      // merged read serves the updated state exactly
      assert(s.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 1000)
      assert(s.sql(s"SELECT sum(cents) FROM $t WHERE v = 'U'").head.getLong(0)
        == (100L to 109L).map(_ * 10 + 1).sum)
      assert(s.sql(s"SELECT count(*) FROM $t WHERE v = 'U'").head.getLong(0) == 10)
      // time travel: pre-update snapshot unchanged
      assert(s.sql(s"SELECT count(*) FROM $t VERSION AS OF 1 WHERE v = 'U'")
        .head.getLong(0) == 0)
    } finally rm(root)
  }

  test("MoR DELETE: tombstone-only commit; MERGE: all three actions as one delta") {
    val (cat, root) = freshCatalog()
    try {
      val t = morTable(cat)
      val store = root.resolve("kv")
      s.sql(s"DELETE FROM $t WHERE k >= 990")
      val m2 = Snapshots.manifest(store, 2)
      val fresh2 = m2.filter(_.seq == 2)
      assert(fresh2.nonEmpty && fresh2.forall(Snapshots.isDelete),
        s"DELETE must land tombstones only, got $fresh2")
      assert(s.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 990)

      s.sql(
        s"""MERGE INTO $t t
           |USING (SELECT id AS k, id * 100 AS c FROM range(980, 1005)) src
           |ON t.k = src.k
           |WHEN MATCHED AND src.k % 2 = 0 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET cents = src.c, v = 'M'
           |WHEN NOT MATCHED THEN INSERT (k, v, cents) VALUES (src.k, 'I', src.c)
           |""".stripMargin)
      assert(Snapshots.currentId(store).contains(3), "MERGE must land ONE commit")
      // matched 980..989: evens deleted (5), odds updated (5);
      // 990..1004 not matched (990..999 were deleted): inserted (15)
      assert(s.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 990 - 5 + 15)
      assert(s.sql(s"SELECT count(*), sum(cents) FROM $t WHERE v = 'M'")
        .head.toSeq == Seq(5L, (981L to 989L by 2).map(_ * 100).sum))
      assert(s.sql(s"SELECT count(*) FROM $t WHERE v = 'I'").head.getLong(0) == 15)
      // deleted evens really gone
      assert(s.sql(s"SELECT count(*) FROM $t WHERE k IN (980, 982, 984, 986, 988)")
        .head.getLong(0) == 0)
    } finally rm(root)
  }

  test("compaction folds deltas physically; table returns to the pure scan path") {
    val (cat, root) = freshCatalog()
    try {
      val t = morTable(cat)
      val store = root.resolve("kv")
      s.sql(s"UPDATE $t SET v = 'U' WHERE k < 10")
      s.sql(s"DELETE FROM $t WHERE k >= 995")
      val before = s.sql(s"SELECT k, v, cents FROM $t").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
      assert(Snapshots.manifest(store, Snapshots.currentId(store).get)
        .exists(Snapshots.isDelete), "precondition: tombstones present")
      s.sql(s"CALL $cat.system.compact('kv', 4)")
      val cur = Snapshots.currentId(store).get
      assert(!Snapshots.manifest(store, cur).exists(Snapshots.isDelete),
        "compaction must fold tombstones physically")
      val after = s.sql(s"SELECT k, v, cents FROM $t").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
      assert(after.toSeq == before.toSeq, "compaction changed the table's rows")
    } finally rm(root)
  }

  test("a delta commit mid-stream fails the CDC source loudly (no silent double-count)") {
    val (cat, root) = freshCatalog()
    val sinkDir = Files.createTempDirectory("graft_mor_stream")
    try {
      val t = morTable(cat, rows = 100)
      val q = s.readStream.table(t)
        .writeStream.format("parquet")
        .option("path", sinkDir.resolve("data").toString)
        .option("checkpointLocation", sinkDir.resolve("ckpt").toString)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        // an UPDATE lands tombstone + replacement rows: streaming that
        // window as appends would deliver the new images with no
        // retraction — the source must refuse, not double-count
        s.sql(s"UPDATE $t SET cents = cents + 1 WHERE k < 10")
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
        assert(e.getMessage.contains("not append-only") ||
          Option(e.getCause).exists(_.getMessage.contains("not append-only")),
          s"wrong failure: ${e.getMessage}")
      } finally q.stop()
    } finally { rm(root); rm(sinkDir) }
  }

  test("chained deltas stay exact: update-over-update, sequence rule holds") {
    val (cat, root) = freshCatalog()
    try {
      val t = morTable(cat, rows = 100)
      s.sql(s"UPDATE $t SET cents = cents + 1 WHERE k < 50")  // via delta
      s.sql(s"UPDATE $t SET cents = cents + 1 WHERE k < 20")  // delta over merged read
      s.sql(s"DELETE FROM $t WHERE k = 0")
      val got = s.sql(s"SELECT sum(cents), count(*) FROM $t").head
      val expect = (1L until 100L).map(k =>
        k * 10 + (if (k < 20) 2 else if (k < 50) 1 else 0)).sum
      assert(got.getLong(0) == expect && got.getLong(1) == 99)
    } finally rm(root)
  }
}
