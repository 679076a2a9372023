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

  test("refusals: rename/drop on morkey or partitioned tables, statscol drop, last column") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.m (k BIGINT NOT NULL, v STRING) TBLPROPERTIES ('morkey'='k')")
      intercept[Exception] { s.sql(s"ALTER TABLE $cat.m RENAME COLUMN v TO w") }
      s.sql(s"CREATE TABLE $cat.p (k BIGINT, p BIGINT) PARTITIONED BY (p)")
      intercept[Exception] { s.sql(s"ALTER TABLE $cat.p DROP COLUMN k") }
      s.sql(s"CREATE TABLE $cat.s (k BIGINT, v STRING) TBLPROPERTIES ('statscol'='k')")
      intercept[Exception] { s.sql(s"ALTER TABLE $cat.s DROP COLUMN k") }
      s.sql(s"CREATE TABLE $cat.one (k BIGINT)")
      intercept[Exception] { s.sql(s"ALTER TABLE $cat.one DROP COLUMN k") }
    } finally rm(root)
  }
}
