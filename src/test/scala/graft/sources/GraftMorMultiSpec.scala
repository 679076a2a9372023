package graft.sources

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import graft.etl.Snapshots
import org.scalatest.funsuite.AnyFunSuite

/** COMPOSITE-key merge-on-read DML (`'morkey'='a,b'`): tombstones carry
  * every key column, the merged read anti-joins on the full set (per-
  * line addressing, not per-order), key-column updates tombstone the OLD
  * composite key, and the coexistence gate holds per column SET.
  */
class GraftMorMultiSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private var n = 0
  private def freshCatalog(): (String, Path) = {
    n += 1
    val cat = s"gmm$n"
    val root = Files.createTempDirectory(s"graft_mormulti$n")
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, root)
  }

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  /** 100 orders x 5 lines: the link-table shape. */
  private def pairTable(cat: String): String = {
    s.sql(s"CREATE TABLE $cat.kv (o BIGINT NOT NULL, line BIGINT NOT NULL, " +
      "v STRING) TBLPROPERTIES ('morkey'='o,line', 'statscol'='o')")
    s.sql(s"INSERT INTO $cat.kv " +
      "SELECT id DIV 5, id % 5, concat('v', id) FROM range(0, 500)")
    s"$cat.kv"
  }

  test("composite DELETE addresses one line, not the whole order") {
    val (cat, root) = freshCatalog()
    try {
      val t = pairTable(cat)
      val store = root.resolve("kv")
      s.sql(s"DELETE FROM $t WHERE o = 7 AND line = 3")
      // tombstone carries BOTH columns
      val tombs = Snapshots.manifest(store, 2).filter(Snapshots.isDelete)
      assert(tombs.nonEmpty)
      val tf = s.read.parquet(store.resolve(tombs.head.relPath).toString)
      assert(tf.columns.toSet == Set("o", "line"))
      assert(tf.count() == 1)
      // order 7 keeps its other 4 lines — a single-column anti-join
      // would have erased all 5
      assert(s.sql(s"SELECT count(*) FROM $t WHERE o = 7").head.getLong(0) == 4)
      assert(s.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 499)
    } finally rm(root)
  }

  test("composite UPDATE of a KEY column tombstones the OLD pair") {
    val (cat, root) = freshCatalog()
    try {
      val t = pairTable(cat)
      // move (3, 0..4) to lines 10..14: the key itself changes
      s.sql(s"UPDATE $t SET line = line + 10 WHERE o = 3")
      assert(s.sql(s"SELECT count(*) FROM $t WHERE o = 3").head.getLong(0) == 5)
      assert(s.sql(s"SELECT sum(line) FROM $t WHERE o = 3").head.getLong(0)
        == (10L to 14L).sum)
      assert(s.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 500)
    } finally rm(root)
  }

  test("tombstone coexistence gate compares column SETS") {
    val (cat, root) = freshCatalog()
    try {
      val t = pairTable(cat)
      s.sql(s"DELETE FROM $t WHERE o = 1 AND line = 1")
      val store = root.resolve("kv")
      // a layer-level single-column tombstone against a composite store
      // must refuse: mixed shapes would schema-merge into a null-padded
      // anti-join that deletes nothing
      import org.apache.spark.sql.functions.lit
      val oneCol = s.range(1).select(lit(2L).as("o"))
      val e = intercept[IllegalArgumentException] {
        Snapshots.publishDeletes(s, store, oneCol)
      }
      assert(e.getMessage.contains("conflict"))
      // the same composite SET (either column order) is accepted
      val pair = s.range(1).select(lit(2L).as("line"), lit(2L).as("o"))
      Snapshots.publishDeletes(s, store, pair)
      assert(s.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 498)
      assert(s.sql(s"SELECT count(*) FROM $t WHERE o = 2").head.getLong(0) == 4)
    } finally rm(root)
  }

  test("merged read after compaction folds composite tombstones away") {
    val (cat, root) = freshCatalog()
    try {
      val t = pairTable(cat)
      s.sql(s"DELETE FROM $t WHERE o = 9 AND line = 0")
      s.sql(s"UPDATE $t SET v = 'U' WHERE o = 9 AND line = 1")
      val store = root.resolve("kv")
      assert(Snapshots.manifest(store, 3).exists(Snapshots.isDelete))
      s.sql(s"CALL ${cat}.system.compact(tbl => 'kv', target_files => 2)")
      val last = Snapshots.currentId(store).get
      assert(!Snapshots.manifest(store, last).exists(Snapshots.isDelete),
        "compaction must fold composite tombstones physically")
      assert(s.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 499)
      assert(s.sql(s"SELECT v FROM $t WHERE o = 9 AND line = 1").head.getString(0) == "U")
    } finally rm(root)
  }

  test("a nullable or missing key column refuses at DML time") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.bad (o BIGINT NOT NULL, line BIGINT, v STRING) " +
        "TBLPROPERTIES ('morkey'='o,line')")
      s.sql(s"INSERT INTO $cat.bad VALUES (1, 1, 'x')")
      val e = intercept[Exception] {
        s.sql(s"UPDATE $cat.bad SET v = 'y' WHERE o = 1")
      }
      assert(e.getMessage.contains("NOT NULL"))
    } finally rm(root)
  }
}
