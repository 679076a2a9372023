package graft.sources

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import graft.etl.Snapshots
import org.scalatest.funsuite.AnyFunSuite

/** PARTITIONED BY + morkey composition (r14): merge-on-read row-level
  * DML on a value-pure partitioned table. The delta write's insert half
  * stages `_pv=` value-pure with both zone-map stories (statscol +
  * degenerate partition range), tombstones apply through the merged
  * read, dynamic INSERT OVERWRITE still replaces exactly its
  * partitions, and compaction folds back to a scannable table.
  */
class GraftMorPartSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private var n = 0
  private def fresh(): (String, Path) = {
    n += 1
    val cat = s"gmp$n"
    val root = Files.createTempDirectory(s"graft_morpart$n")
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, root)
  }

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  private def mk(cat: String): String = {
    s.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL, p BIGINT, v STRING) " +
      s"PARTITIONED BY (p) TBLPROPERTIES ('morkey'='k', 'statscol'='k')")
    s.sql(s"INSERT INTO $cat.t SELECT id, id % 4, concat('v', id) FROM range(0, 1000)")
    s"$cat.t"
  }

  test("partitioned MoR UPDATE: value-pure delta, zero base rewrites, merged read") {
    val (cat, root) = fresh()
    try {
      val t = mk(cat)
      val store = root.resolve("t")
      val base = Snapshots.manifest(store, 1)
      assert(base.forall(e => Snapshots.partValueOf(e.relPath).isDefined),
        "insert did not stage value-pure")
      s.sql(s"UPDATE $t SET v = 'U' WHERE k BETWEEN 100 AND 109")
      val after = Snapshots.manifest(store, 2)
      base.foreach(b => assert(after.exists(e =>
        e.relPath == b.relPath && e.md5 == b.md5 && e.seq == b.seq),
        s"base file ${b.relPath} was rewritten by a partitioned MoR UPDATE"))
      val freshE = after.filterNot(e => base.exists(_.relPath == e.relPath))
      val (tombs, datas) = freshE.partition(Snapshots.isDelete)
      assert(tombs.nonEmpty && datas.nonEmpty)
      // the replacement data files are VALUE-PURE and carry BOTH zone
      // stories: the partition column's degenerate v:v named range and
      // the statscol legacy range (tombstone pruning needs the latter)
      datas.foreach { e =>
        assert(Snapshots.partValueOf(e.relPath).isDefined,
          s"delta data file ${e.relPath} is not value-pure")
        assert(e.multi.exists(m => m._1 == "p" && m._2 == m._3),
          s"delta data file ${e.relPath} lacks the partition v:v zone: ${e.multi}")
        assert(e.stats.isDefined,
          s"delta data file ${e.relPath} lacks the legacy statscol range")
      }
      assert(s.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 1000)
      assert(s.sql(s"SELECT count(*) FROM $t WHERE v = 'U'").head.getLong(0) == 10)
      // time travel unaffected
      assert(s.sql(s"SELECT count(*) FROM $t VERSION AS OF 1 WHERE v = 'U'")
        .head.getLong(0) == 0)
    } finally rm(root)
  }

  test("merged read partition-prunes: only the probed partition's files open") {
    val (cat, root) = fresh()
    try {
      val t = mk(cat)
      s.sql(s"DELETE FROM $t WHERE k >= 996") // tombstone-bearing now
      val df = s.sql(s"SELECT count(*) FROM $t WHERE p = 2")
      // rows: k % 4 == 2, k < 996 → 249 of 250 (996 removed... 996%4=0,
      // 997%4=1, 998%4=2, 999%4=3 → p=2 loses k=998)
      assert(df.head.getLong(0) == 249)
      val scans = df.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty, "merged read did not splice to file scans")
      val dataScans = scans.filterNot(
        _.relation.location.inputFiles.exists(_.contains("deletes")))
      val opened = dataScans.map(_.selectedPartitions.totalNumberOfFiles).sum
      val total = Snapshots.manifest(root.resolve("t"),
        Snapshots.currentId(root.resolve("t")).get)
        .count(e => !Snapshots.isDelete(e))
      assert(opened < total,
        s"partition predicate opened all $total data files of the merged read")
    } finally rm(root)
  }

  test("MERGE + dynamic overwrite + compact keep the layout and answers") {
    val (cat, root) = fresh()
    try {
      val t = mk(cat)
      val store = root.resolve("t")
      // MERGE: update + insert through the delta path
      s.sql(s"MERGE INTO $t USING (SELECT id * 2 AS k FROM range(495, 505)) src " +
        s"ON $t.k = src.k " +
        "WHEN MATCHED THEN UPDATE SET v = 'M' " +
        "WHEN NOT MATCHED THEN INSERT (k, p, v) VALUES (src.k, src.k % 4, 'I')")
      assert(s.sql(s"SELECT count(*) FROM $t WHERE v = 'M'").head.getLong(0) == 5,
        "matched leg (even k in [990,1000) ∪ updated)")
      assert(s.sql(s"SELECT count(*) FROM $t WHERE v = 'I'").head.getLong(0) == 5)
      // every data file still value-pure
      val m = Snapshots.manifest(store, Snapshots.currentId(store).get)
      m.filterNot(Snapshots.isDelete).foreach(e =>
        assert(Snapshots.partValueOf(e.relPath).isDefined, s"${e.relPath} not value-pure"))
      // dynamic overwrite replaces exactly partition 1, carries the rest
      // AND the live tombstones
      val pk = "spark.sql.sources.partitionOverwriteMode"
      val prior = s.conf.get(pk)
      s.conf.set(pk, "dynamic")
      try s.sql(s"INSERT OVERWRITE $t SELECT id, 1L, 'OW' FROM range(2000, 2100)")
      finally s.conf.set(pk, prior)
      assert(s.sql(s"SELECT count(*) FROM $t WHERE p = 1").head.getLong(0) == 100)
      // matched rows live in partitions 0 and 2 (k%4 of 990..998 even):
      // all survive the p=1 replacement
      assert(s.sql(s"SELECT count(*) FROM $t WHERE v = 'M'").head.getLong(0) == 5)
      // compact folds tombstones; answers survive
      val pre = s.sql(s"SELECT sum(k) FROM $t").head.getLong(0)
      s.sql(s"CALL $cat.system.compact('t', 8)")
      assert(!Snapshots.manifest(store, Snapshots.currentId(store).get)
        .exists(Snapshots.isDelete), "compact left tombstones")
      assert(s.sql(s"SELECT sum(k) FROM $t").head.getLong(0) == pre)
    } finally rm(root)
  }

  test("pure DELETE on partitioned MoR: tombstone-only commit") {
    val (cat, root) = fresh()
    try {
      val t = mk(cat)
      val store = root.resolve("t")
      s.sql(s"DELETE FROM $t WHERE k IN (1, 2, 3)")
      val m2 = Snapshots.manifest(store, 2)
      val m1 = Snapshots.manifest(store, 1)
      val freshE = m2.filterNot(e => m1.exists(_.relPath == e.relPath))
      assert(freshE.nonEmpty && freshE.forall(Snapshots.isDelete),
        s"expected a tombstone-only delta, got $freshE")
      assert(s.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 997)
    } finally rm(root)
  }

  test("TRIPLE composition: partitioned + morkey + renamed columns") {
    val (cat, root) = fresh()
    try {
      val t = mk(cat) // morkey=k, partitioned by p, statscol=k
      val store = root.resolve("t")
      // rename EVERY column, including the key and the partition column
      s.sql(s"ALTER TABLE $t RENAME COLUMN k TO id")
      s.sql(s"ALTER TABLE $t RENAME COLUMN p TO shard")
      s.sql(s"ALTER TABLE $t RENAME COLUMN v TO body")
      // MoR UPDATE under the new names: value-pure physical delta,
      // physical-named tombstone, zero base rewrites
      val base = Snapshots.manifest(store, 1)
      s.sql(s"UPDATE $t SET body = 'U' WHERE id BETWEEN 100 AND 109")
      val after = Snapshots.manifest(store, Snapshots.currentId(store).get)
      base.foreach(b => assert(after.exists(e =>
        e.relPath == b.relPath && e.md5 == b.md5 && e.seq == b.seq)))
      val freshE = after.filterNot(e => base.exists(_.relPath == e.relPath))
      val (tombs, datas) = freshE.partition(Snapshots.isDelete)
      assert(tombs.nonEmpty && datas.nonEmpty)
      tombs.foreach { e =>
        val cols = s.read.parquet(store.resolve(e.relPath).toString).columns.toSet
        assert(cols == Set("k"), s"tombstone must carry the physical key: $cols")
      }
      datas.foreach { e =>
        assert(Snapshots.partValueOf(e.relPath).isDefined, s"${e.relPath} not value-pure")
        val cols = s.read.parquet(store.resolve(e.relPath).toString).columns.toSet
        assert(cols == Set("k", "p", "v"), s"delta must write physical names: $cols")
      }
      // merged read binds logical names, applies the delta, still prunes
      assert(s.sql(s"SELECT count(*) FROM $t WHERE body = 'U'").head.getLong(0) == 10)
      assert(s.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 1000)
      assert(s.sql(s"SELECT count(*) FROM $t WHERE shard = 2").head.getLong(0) == 250)
      // MoR DELETE + dynamic overwrite keyed by the renamed partition col
      s.sql(s"DELETE FROM $t WHERE id IN (0, 1)")
      val pk = "spark.sql.sources.partitionOverwriteMode"
      val prior = s.conf.get(pk)
      s.conf.set(pk, "dynamic")
      try s.sql(s"INSERT OVERWRITE $t SELECT id, 3L, 'ow' FROM range(5000, 5100)")
      finally s.conf.set(pk, prior)
      assert(s.sql(s"SELECT count(*) FROM $t WHERE shard = 3").head.getLong(0) == 100)
      assert(s.sql(s"SELECT count(*) FROM $t").head.getLong(0)
        == 1000 - 2 - 250 + 100) // shard-3 quarter replaced; ids 0,1 were shard 0,1
      // compact folds; the logical shape survives
      s.sql(s"CALL $cat.system.compact('t', 4)")
      assert(s.table(t).schema.fieldNames.toSeq == Seq("id", "shard", "body"))
      // the shard-3 overwrite replaced ids 103 and 107 (the two 'U' rows
      // with id % 4 == 3), so 8 of the original 10 survive
      assert(s.sql(s"SELECT count(*) FROM $t WHERE body = 'U'").head.getLong(0) == 8)
    } finally rm(root)
  }
}
