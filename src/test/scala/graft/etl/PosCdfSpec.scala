package graft.etl

import java.nio.file.Files

import scala.collection.JavaConverters._

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Change feed over POSITION-tombstone windows (r14): retractions are
  * the rows VISIBLE at `from` that a window pair kills — never rows
  * that were already dead (the pair writer's raw scan may re-name dead
  * coordinates by design), and never rows born-and-erased inside the
  * window.
  */
class PosCdfSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("position-delete windows: exact retractions, no dead-row replays") {
    val cat = "pcdf" + System.nanoTime()
    val root = Files.createTempDirectory("graft_poscdf")
    s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    try {
      s.sql(s"CREATE TABLE $cat.t (v BIGINT, tag STRING) " +
        "TBLPROPERTIES ('mordelete'='position')")
      s.sql(s"INSERT INTO $cat.t SELECT id % 100, concat('s', id) FROM range(0, 1000)")
      s.sql(s"DELETE FROM $cat.t WHERE v = 5")   // snapshot 2
      s.sql(s"DELETE FROM $cat.t WHERE v < 10")  // snapshot 3: re-names v=5 dead rows
      s.sql(s"INSERT INTO $cat.t VALUES (7, 'late')") // snapshot 4
      s.sql(s"DELETE FROM $cat.t WHERE tag = 'late'") // snapshot 5: kills a window-born row
      val store = root.resolve("t")

      // window (1,2]: exactly the 10 v=5 rows retract
      val w12 = Snapshots.readChangeFeed(s, store, 1, 2)
      assert(w12.filter(col("_change_type") === "delete").count() == 10)
      assert(w12.filter(col("_change_type") === "insert").count() == 0)

      // window (2,3]: v<10 minus the ALREADY-DEAD v=5 rows = 90, even
      // though snapshot 3's pair file re-names the v=5 coordinates
      val w23 = Snapshots.readChangeFeed(s, store, 2, 3)
      val d23 = w23.filter(col("_change_type") === "delete")
      assert(d23.count() == 90, s"got ${d23.count()}")
      assert(d23.filter(col("v") === 5).count() == 0,
        "a row dead at `from` was retracted again")

      // window (3,5]: the 'late' row is born AND erased inside — neither
      // an insert nor a retraction survives the window
      val w35 = Snapshots.readChangeFeed(s, store, 3, 5)
      assert(w35.filter(col("tag") === "late").count() == 0)
      assert(w35.filter(col("_change_type") === "delete").count() == 0)

      // full-window consistency: from-state + feed = to-state
      val w15 = Snapshots.readChangeFeed(s, store, 1, 5)
      val inserts = w15.filter(col("_change_type") === "insert").count()
      val deletes = w15.filter(col("_change_type") === "delete").count()
      val fromN = Snapshots.readAt(s, store, 1).count()
      val toN = Snapshots.readAt(s, store, 5).count()
      assert(fromN + inserts - deletes == toN,
        s"$fromN + $inserts - $deletes != $toN")
    } finally {
      val walk = Files.walk(root)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally walk.close()
    }
  }
}
