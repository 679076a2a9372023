package graft.sources

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import graft.etl.Snapshots
import org.scalatest.funsuite.AnyFunSuite

/** ALTER TABLE RENAME/DROP COLUMN with physical-name resolution
  * (`colmap` props — the name-map analog of field ids): rename is pure
  * metadata over unchanged files, reads translate at the scan boundary,
  * writes land under stable physical names, time travel preserves each
  * snapshot's declared shape, a dropped column's bytes never resurface
  * under a re-added name, and row-level DML survives a rename.
  */
class GraftRenameSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private var n = 0
  private def freshCatalog(): (String, Path) = {
    n += 1
    val cat = s"gren$n"
    val root = Files.createTempDirectory(s"graft_ren$n")
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, root)
  }

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  test("RENAME COLUMN is metadata-only; reads, filters and writes translate") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT, v STRING) TBLPROPERTIES ('statscol'='k')")
      s.sql(s"INSERT INTO $cat.t SELECT id, concat('a', id) FROM range(0, 100)")
      val store = root.resolve("t")
      val before = Snapshots.manifest(store, 1)
      s.sql(s"ALTER TABLE $cat.t RENAME COLUMN v TO label")
      // metadata only: no data file touched
      Snapshots.manifest(store, Snapshots.currentId(store).get)
        .foreach(e => assert(before.exists(b =>
          b.relPath == e.relPath && b.md5 == e.md5), s"rename rewrote ${e.relPath}"))
      assert(s.sql(s"SELECT label FROM $cat.t WHERE k = 7").head.getString(0) == "a7")
      assert(s.sql(s"SELECT count(*) FROM $cat.t WHERE label = 'a9'").head.getLong(0) == 1)
      // writes after the rename land under the stable physical name:
      // a pre-rename reader shape (VERSION AS OF) still sees them whole
      s.sql(s"INSERT INTO $cat.t SELECT id, concat('b', id) FROM range(100, 110)")
      assert(s.sql(s"SELECT count(*) FROM $cat.t").head.getLong(0) == 110)
      assert(s.sql(s"SELECT label FROM $cat.t WHERE k = 105").head.getString(0) == "b105")
      // time travel to the pre-rename snapshot keeps the OLD column name
      val v1cols = s.sql(s"SELECT * FROM $cat.t VERSION AS OF 1").columns.toSeq
      assert(v1cols == Seq("k", "v"), s"pre-rename shape lost: $v1cols")
      // rename twice: still one physical name underneath
      s.sql(s"ALTER TABLE $cat.t RENAME COLUMN label TO tag")
      assert(s.sql(s"SELECT tag FROM $cat.t WHERE k = 3").head.getString(0) == "a3")
      // rename BACK to the physical name: the mapping collapses away
      s.sql(s"ALTER TABLE $cat.t RENAME COLUMN tag TO v")
      assert(s.sql(s"SHOW TBLPROPERTIES $cat.t").collect()
        .forall(r => !r.getString(0).startsWith("colmap.")),
        "identity mapping must collapse out of the marker")
      assert(s.sql(s"SELECT v FROM $cat.t WHERE k = 3").head.getString(0) == "a3")
    } finally rm(root)
  }

  test("DROP COLUMN retires the physical; a re-added name never resurrects old bytes") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT, secret STRING)")
      s.sql(s"INSERT INTO $cat.t SELECT id, concat('classified', id) FROM range(0, 50)")
      s.sql(s"ALTER TABLE $cat.t DROP COLUMN secret")
      assert(s.sql(s"SELECT * FROM $cat.t").columns.toSeq == Seq("k"))
      // re-add the same NAME: must read NULL everywhere, never the old bytes
      s.sql(s"ALTER TABLE $cat.t ADD COLUMN secret STRING")
      val vals = s.sql(s"SELECT secret FROM $cat.t").collect().map(_.isNullAt(0))
      assert(vals.forall(identity),
        "dropped column's bytes resurfaced under the re-added name")
      // and new writes to the re-added column are visible
      s.sql(s"INSERT INTO $cat.t SELECT id, 'fresh' FROM range(50, 55)")
      assert(s.sql(s"SELECT count(*) FROM $cat.t WHERE secret = 'fresh'")
        .head.getLong(0) == 5)
      assert(s.sql(s"SELECT count(*) FROM $cat.t WHERE secret IS NULL")
        .head.getLong(0) == 50)
      // time travel to the pre-drop snapshot still reads the old column
      assert(s.sql(s"SELECT count(*) FROM $cat.t VERSION AS OF 1 " +
        "WHERE secret LIKE 'classified%'").head.getLong(0) == 50)
    } finally rm(root)
  }

  test("row-level DML and compaction survive a rename") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT)")
      s.sql(s"INSERT INTO $cat.t SELECT id, id * 10 FROM range(0, 100)")
      s.sql(s"ALTER TABLE $cat.t RENAME COLUMN v TO cents")
      s.sql(s"UPDATE $cat.t SET cents = cents + 1 WHERE k < 10")
      s.sql(s"DELETE FROM $cat.t WHERE k >= 90")
      assert(s.sql(s"SELECT count(*), sum(cents) FROM $cat.t").head.toSeq ==
        Seq(90L, (0L until 90L).map(k => k * 10 + (if (k < 10) 1 else 0)).sum))
      // a second rename after DML keeps answering right
      s.sql(s"ALTER TABLE $cat.t RENAME COLUMN cents TO amount")
      assert(s.sql(s"SELECT sum(amount) FROM $cat.t WHERE k < 10").head.getLong(0)
        == (0L until 10L).map(_ * 10 + 1).sum)
      val store = root.resolve("t")
      s.sql(s"CALL $cat.system.compact('t', 2)")
      assert(s.sql(s"SELECT count(*), sum(amount) FROM $cat.t").head.toSeq ==
        Seq(90L, (0L until 90L).map(k => k * 10 + (if (k < 10) 1 else 0)).sum))
      assert(Snapshots.currentId(store).isDefined)
    } finally rm(root)
  }

  test("refusals: morkey-column drop, partition-col drop, statscol drop, last column") {
    val (cat, root) = freshCatalog()
    try {
      // morkey tables rename freely since r14 (physical-named tombstones);
      // only dropping the morkey column itself refuses
      s.sql(s"CREATE TABLE $cat.m (k BIGINT NOT NULL, v STRING) TBLPROPERTIES ('morkey'='k')")
      intercept[Exception] { s.sql(s"ALTER TABLE $cat.m DROP COLUMN k") }
      // partitioned tables rename/drop freely since r14 — only dropping
      // the PARTITION COLUMN itself refuses
      s.sql(s"CREATE TABLE $cat.p (k BIGINT, p BIGINT) PARTITIONED BY (p)")
      intercept[Exception] { s.sql(s"ALTER TABLE $cat.p DROP COLUMN p") }
      s.sql(s"ALTER TABLE $cat.p DROP COLUMN k") // non-partition column: fine
      s.sql(s"CREATE TABLE $cat.s (k BIGINT, v STRING) TBLPROPERTIES ('statscol'='k')")
      intercept[Exception] { s.sql(s"ALTER TABLE $cat.s DROP COLUMN k") }
      s.sql(s"CREATE TABLE $cat.one (k BIGINT)")
      intercept[Exception] { s.sql(s"ALTER TABLE $cat.one DROP COLUMN k") }
    } finally rm(root)
  }

  test("rename on a PARTITIONED table: metadata-only, writes stay physical, pruning survives") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT, p BIGINT, v STRING) PARTITIONED BY (p) " +
        "TBLPROPERTIES ('statscol'='k')")
      s.sql(s"INSERT INTO $cat.t SELECT id, id % 4, concat('v', id) FROM range(0, 400)")
      val store = root.resolve("t")
      val before = Snapshots.manifest(store, 1)
      // rename BOTH a data column and the partition column itself
      s.sql(s"ALTER TABLE $cat.t RENAME COLUMN v TO body")
      s.sql(s"ALTER TABLE $cat.t RENAME COLUMN p TO shard")
      // metadata-only: no data file changed
      val afterAlter = Snapshots.manifest(store,
        Snapshots.currentId(store).get).filterNot(Snapshots.isDelete)
      before.foreach(b => assert(afterAlter.exists(e =>
        e.relPath == b.relPath && e.md5 == b.md5), s"${b.relPath} rewritten by RENAME"))
      // reads bind the new logical names; DESCRIBE partitioning follows
      assert(s.sql(s"SELECT count(*) FROM $cat.t WHERE shard = 2 AND body = 'v2'")
        .head.getLong(0) == 1)
      assert(s.table(s"$cat.t").schema.fieldNames.toSeq == Seq("k", "shard", "body"))
      // an INSERT after the rename lands PHYSICAL names + value-pure
      s.sql(s"INSERT INTO $cat.t SELECT id, id % 4, 'new' FROM range(400, 500)")
      val m2 = Snapshots.manifest(store, Snapshots.currentId(store).get)
      val freshE = m2.filterNot(e => afterAlter.exists(_.relPath == e.relPath))
      assert(freshE.nonEmpty)
      freshE.foreach { e =>
        assert(Snapshots.partValueOf(e.relPath).isDefined, s"${e.relPath} not value-pure")
        val cols = s.read.parquet(store.resolve(e.relPath).toString).columns.toSet
        assert(cols == Set("k", "p", "v"),
          s"post-rename insert must write PHYSICAL names, got $cols")
      }
      assert(s.sql(s"SELECT count(*) FROM $cat.t").head.getLong(0) == 500)
      // dynamic overwrite keyed by the RENAMED partition column
      val pk = "spark.sql.sources.partitionOverwriteMode"
      val prior = s.conf.get(pk)
      s.conf.set(pk, "dynamic")
      try s.sql(s"INSERT OVERWRITE $cat.t SELECT id, 1L, 'ow' FROM range(0, 50)")
      finally s.conf.set(pk, prior)
      assert(s.sql(s"SELECT count(*) FROM $cat.t WHERE shard = 1").head.getLong(0) == 50)
      assert(s.sql(s"SELECT count(*) FROM $cat.t WHERE shard = 0").head.getLong(0) == 125)
      // row-level UPDATE re-stages value-pure under physical names
      s.sql(s"UPDATE $cat.t SET body = 'upd' WHERE shard = 2 AND k < 10")
      assert(s.sql(s"SELECT count(*) FROM $cat.t WHERE body = 'upd'").head.getLong(0)
        == 2) // shard 2 with k < 10: ids 2 and 6 (the overwrite only touched shard 1)
    } finally rm(root)
  }

  test("rename on a MORKEY table: tombstones stay physical, MoR DML and merged reads survive") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL, v STRING) " +
        "TBLPROPERTIES ('morkey'='k', 'statscol'='k')")
      s.sql(s"INSERT INTO $cat.t SELECT id, concat('v', id) FROM range(0, 500)")
      s.sql(s"DELETE FROM $cat.t WHERE k < 10") // pre-rename tombstone under 'k'
      s.sql(s"ALTER TABLE $cat.t RENAME COLUMN k TO id")
      s.sql(s"ALTER TABLE $cat.t RENAME COLUMN v TO body")
      // merged read binds the NEW logical names over physical files+tombstones
      assert(s.sql(s"SELECT count(*) FROM $cat.t").head.getLong(0) == 490)
      assert(s.sql(s"SELECT count(*) FROM $cat.t WHERE id < 20 AND body LIKE 'v%'")
        .head.getLong(0) == 10)
      // post-rename MoR DML: the tombstone must land under the PHYSICAL
      // key name so it merge-schemas with the pre-rename one
      s.sql(s"UPDATE $cat.t SET body = 'U' WHERE id BETWEEN 100 AND 109")
      s.sql(s"DELETE FROM $cat.t WHERE id = 499")
      assert(s.sql(s"SELECT count(*) FROM $cat.t").head.getLong(0) == 489)
      assert(s.sql(s"SELECT count(*) FROM $cat.t WHERE body = 'U'").head.getLong(0) == 10)
      val store = root.resolve("t")
      val tombCols = Snapshots.manifest(store, Snapshots.currentId(store).get)
        .filter(Snapshots.isDelete)
        .flatMap(e => s.read.parquet(store.resolve(e.relPath).toString).columns)
        .toSet
      assert(tombCols == Set("k"), s"tombstones must stay physical-named: $tombCols")
      // compact folds everything; reads keep the logical shape
      s.sql(s"CALL $cat.system.compact('t', 4)")
      assert(s.sql(s"SELECT count(*), sum(id) FROM $cat.t WHERE body = 'U'").head.toSeq
        == Seq(10L, (100L to 109L).sum))
      assert(s.table(s"$cat.t").schema.fieldNames.toSeq == Seq("id", "body"))
    } finally rm(root)
  }
}
