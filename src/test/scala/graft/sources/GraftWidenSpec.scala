package graft.sources

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** ALTER TABLE ... ALTER COLUMN ... TYPE — lossless WIDENING only
  * (r14): old files keep their physical type and Spark's parquet
  * readers promote at the column boundary; `VERSION AS OF` resolves
  * each snapshot's own (#meta-carried) shape; any narrowing refuses.
  */
class GraftWidenSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private var n = 0
  private def fresh(): (String, Path) = {
    n += 1
    val cat = s"gwd$n"
    val root = Files.createTempDirectory(s"graft_widen$n")
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, root)
  }

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  test("int->long widening: mixed-file reads, time travel keeps the old shape") {
    val (cat, root) = fresh()
    try {
      s.sql(s"CREATE TABLE $cat.t (k INT, v FLOAT, m DECIMAL(10,2))")
      s.sql(s"INSERT INTO $cat.t SELECT CAST(id AS INT), CAST(id AS FLOAT), " +
        "CAST(id AS DECIMAL(10,2)) FROM range(0, 100)")
      s.sql(s"ALTER TABLE $cat.t ALTER COLUMN k TYPE BIGINT")
      s.sql(s"ALTER TABLE $cat.t ALTER COLUMN v TYPE DOUBLE")
      s.sql(s"ALTER TABLE $cat.t ALTER COLUMN m TYPE DECIMAL(20,4)")
      // new rows land with values only a wide type holds
      s.sql(s"INSERT INTO $cat.t VALUES (${Long.MaxValue}, 1.5D, CAST(9 AS DECIMAL(20,4)))")
      val sch = s.table(s"$cat.t").schema
      assert(sch("k").dataType.simpleString == "bigint" &&
        sch("v").dataType.simpleString == "double" &&
        sch("m").dataType.simpleString == "decimal(20,4)", sch.catalogString)
      // mixed files (int32 + int64 physical) answer under ONE shape
      val r = s.sql(s"SELECT max(k), count(*), sum(v), sum(m) FROM $cat.t").head
      assert(r.getLong(1) == 101 && r.getLong(0) == Long.MaxValue)
      assert(r.getDouble(2) == (0 until 100).map(_.toDouble).sum + 1.5)
      // time travel to the pre-ALTER snapshot keeps the NARROW shape
      val v1 = s.sql(s"SELECT * FROM $cat.t VERSION AS OF 1")
      assert(v1.schema("k").dataType.simpleString == "int", v1.schema.catalogString)
      assert(v1.count() == 100)
    } finally rm(root)
  }

  test("narrowing and lossy changes refuse loudly") {
    val (cat, root) = fresh()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT, f DOUBLE)")
      s.sql(s"INSERT INTO $cat.t VALUES (1, 1.0)")
      for (bad <- Seq("ALTER COLUMN k TYPE INT",      // narrowing
                      "ALTER COLUMN k TYPE DOUBLE",   // long->double is lossy
                      "ALTER COLUMN f TYPE FLOAT")) { // narrowing
        // Spark's analyzer refuses non-upcasts before the catalog sees
        // them; anything it lets through (e.g. its upcast list admits
        // long->double) hits the catalog's own widening gate
        val e = intercept[Exception](s.sql(s"ALTER TABLE $cat.t $bad"))
        assert(e.getMessage.contains("widening") ||
          e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"),
          s"'$bad' refused for the wrong reason: ${e.getMessage}")
      }
      // the shape and rows are untouched by the refused ALTERs
      assert(s.table(s"$cat.t").schema("k").dataType.simpleString == "bigint")
      assert(s.sql(s"SELECT count(*) FROM $cat.t").head.getLong(0) == 1)
    } finally rm(root)
  }

  test("widening the morkey: merged reads promote old tombstones and data") {
    val (cat, root) = fresh()
    try {
      s.sql(s"CREATE TABLE $cat.t (k INT NOT NULL, v STRING) " +
        "TBLPROPERTIES ('morkey'='k', 'statscol'='k')")
      s.sql(s"INSERT INTO $cat.t SELECT CAST(id AS INT), concat('v', id) FROM range(0, 100)")
      s.sql(s"DELETE FROM $cat.t WHERE k < 10") // int-typed tombstone
      s.sql(s"ALTER TABLE $cat.t ALTER COLUMN k TYPE BIGINT")
      s.sql(s"INSERT INTO $cat.t VALUES (${Long.MaxValue}, 'wide')")
      // merged read: int tombstone erases int rows, long row survives
      val r = s.sql(s"SELECT count(*), max(k) FROM $cat.t").head
      assert(r.getLong(0) == 91 && r.getLong(1) == Long.MaxValue, r.toString)
      // a post-widen DELETE (long-typed tombstone over int files) still lands
      s.sql(s"DELETE FROM $cat.t WHERE k = 50")
      assert(s.sql(s"SELECT count(*) FROM $cat.t").head.getLong(0) == 90)
    } finally rm(root)
  }

  test("MERGE schema evolution composes with merge-on-read (morkey) targets") {
    val (cat, root) = fresh()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL, v BIGINT) " +
        "TBLPROPERTIES ('morkey'='k', 'mergeschema'='true')")
      s.sql(s"INSERT INTO $cat.t SELECT id, id * 10 FROM range(0, 100)")
      s.sql("CREATE OR REPLACE TEMP VIEW wsrc AS SELECT id AS k, " +
        "id * 10 + 1 AS v, concat('t', id) AS tag FROM range(50, 120)")
      // the unannotated MERGE auto-widens the MoR table: matched keys
      // tombstone + re-land with the new column, inserts carry it,
      // untouched old rows surface NULL from pre-evolution files
      s.sql(s"MERGE INTO $cat.t t USING wsrc s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
      assert(s.table(s"$cat.t").columns.toSeq == Seq("k", "v", "tag"))
      assert(s.sql(s"SELECT count(*) FROM $cat.t").head.getLong(0) == 120)
      assert(s.sql(s"SELECT count(*) FROM $cat.t WHERE tag IS NULL")
        .head.getLong(0) == 50)
      assert(s.sql(s"SELECT count(*) FROM $cat.t WHERE tag = concat('t', k)")
        .head.getLong(0) == 70)
      assert(s.sql(s"SELECT sum(v) FROM $cat.t WHERE k >= 50 AND k < 100")
        .head.getLong(0) == (50L until 100L).map(_ * 10 + 1).sum)
      // time travel below the merge keeps the narrow MoR shape
      assert(s.sql(s"SELECT * FROM $cat.t VERSION AS OF 1").columns.toSeq ==
        Seq("k", "v"))
      // and the changefeed over the evolving window serves the widened
      // shape with pre-evolution images NULL-padded
      val feed = graft.etl.Snapshots.readChangeFeed(s, root.resolve("t"), 1,
        graft.etl.Snapshots.currentId(root.resolve("t")).get)
      assert(feed.columns.contains("tag"))
      assert(feed.filter("_change_type = 'delete'").count() == 50)
    } finally rm(root)
  }

  test("merge evolution dial binds bare names under USE cat.ns") {
    val (cat, root) = fresh()
    val prevCat = s.catalog.currentCatalog()
    try {
      s.sql(s"CREATE NAMESPACE $cat.ns")
      s.sql(s"CREATE TABLE $cat.ns.t (k BIGINT, v BIGINT) " +
        "TBLPROPERTIES ('mergeschema'='true')")
      s.sql(s"INSERT INTO $cat.ns.t VALUES (1, 10), (2, 20)")
      s.sql("CREATE OR REPLACE TEMP VIEW nssrc AS " +
        "SELECT CAST(1 AS BIGINT) AS k, CAST(11 AS BIGINT) AS v, 'x' AS tag")
      s.sql(s"USE $cat.ns")
      // the dial must resolve the BARE name through the session's
      // current namespace, not the catalog root
      s.sql("MERGE INTO t tt USING nssrc src ON tt.k = src.k " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
      assert(s.table(s"$cat.ns.t").columns.toSeq == Seq("k", "v", "tag"))
      assert(s.sql(s"SELECT tag FROM $cat.ns.t WHERE k = 1").head.getString(0) == "x")
    } finally {
      s.sql(s"USE $prevCat")
      rm(root)
    }
  }
}
