package graft.plans

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The vectorized merged read: a tombstone-bearing MoR snapshot scan is
  * spliced into its merged logical plan by [[ExpandMergeScan]], so the
  * data legs execute as ordinary vectorized parquet file scans with the
  * query's own filters pushed down — not behind the V1 row bridge. The
  * bridge remains the fallback when the rule is excluded.
  */
class ExpandMergeScanSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private def withMorTable(f: (String, Path) => Unit): Unit = {
    val cat = "xms" + System.nanoTime()
    val root = Files.createTempDirectory("graft_xms")
    s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    try {
      s.sql(s"CREATE TABLE $cat.kv (k BIGINT NOT NULL, v STRING, cents BIGINT) " +
        "TBLPROPERTIES ('morkey'='k')")
      s.sql(s"INSERT INTO $cat.kv SELECT id, concat('v', id), id * 10 FROM range(0, 1000)")
      s.sql(s"UPDATE $cat.kv SET cents = cents + 1, v = 'U' WHERE k BETWEEN 100 AND 109")
      f(s"$cat.kv", root)
    } finally {
      val walk = Files.walk(root)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  test("merged read expands to vectorized parquet legs, no V1 row bridge") {
    withMorTable { (t, _) =>
      val df = s.sql(s"SELECT k, v, cents FROM $t WHERE cents >= 500")
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("GraftMergeScan"),
        s"merged read still executes behind the V1 bridge:\n$phys")
      assert(phys.contains("FileScan parquet"),
        s"expected vectorized parquet file scans in the merged plan:\n$phys")
      // the query's own filter reaches the parquet data legs as a real
      // pushed filter (the whole point of dropping the bridge)
      assert(phys.contains("PushedFilters: [IsNotNull(cents), GreaterThanOrEqual(cents,500)]") ||
        phys.contains("GreaterThanOrEqual(cents,500)"),
        s"filter not pushed to the parquet legs:\n$phys")
      // correctness: updated rows visible, exactly once (ids 50..999)
      assert(df.count() == 950)
      assert(s.sql(s"SELECT count(*) FROM $t WHERE v = 'U'").head.getLong(0) == 10)
      assert(s.sql(s"SELECT sum(cents) FROM $t").head.getLong(0)
        == (0L until 1000L).map(_ * 10).sum + 10)
    }
  }

  test("column pruning reaches the parquet legs through the splice") {
    withMorTable { (t, _) =>
      val df = s.sql(s"SELECT v FROM $t")
      // sparkPlan, not executedPlan: AQE wraps the latter and collect()
      // would not descend into the adaptive subtree
      val scans = df.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty, "no file scans found in the merged plan")
      // data legs read only (k, v): the morkey is needed by the anti-join,
      // v by the projection — cents must be pruned away everywhere
      scans.foreach { sc =>
        assert(!sc.requiredSchema.fieldNames.contains("cents"),
          s"unpruned column 'cents' in leg schema ${sc.requiredSchema.catalogString}")
      }
      assert(df.count() == 1000)
    }
  }

  test("V1 bridge fallback stays correct when the rule is excluded") {
    withMorTable { (t, _) =>
      val key = "spark.sql.optimizer.excludedRules"
      val prior = s.conf.getOption(key)
      val ruleName = ExpandMergeScan(s).ruleName
      s.conf.set(key, prior.map(_ + "," + ruleName).getOrElse(ruleName))
      try {
        val df = s.sql(s"SELECT count(*), sum(cents) FROM $t WHERE v = 'U'")
        val phys = df.queryExecution.executedPlan.toString
        assert(phys.contains("GraftMergeScan"),
          s"exclusion should fall back to the V1 bridge:\n$phys")
        val r = df.head
        assert(r.getLong(0) == 10 && r.getLong(1) == (100L to 109L).map(_ * 10 + 1).sum)
      } finally prior match {
        case Some(p) => s.conf.set(key, p)
        case None => s.conf.unset(key)
      }
    }
  }

  test("self-join of a merged MoR table: each relation splices with fresh attrs") {
    withMorTable { (t, _) =>
      // both sides are tombstone-bearing merged reads; a shared spliced
      // subplan would collide exprIds and corrupt the join
      val df = s.sql(
        s"SELECT a.k, a.v, b.v AS v2 FROM $t a JOIN $t b ON a.k = b.k + 1 " +
          "WHERE a.k BETWEEN 100 AND 109")
      val rows = df.collect()
      assert(rows.length == 10, s"got ${rows.length}")
      // updated rows ('U' for k in 100..109) pair with their k-1 neighbor
      assert(rows.forall(_.getString(1) == "U"), rows.mkString(","))
      assert(rows.count(_.getString(2) == "U") == 9) // b.k in 99..108 -> 100..108 are U
      // and an aggregate over the self-join stays exact
      assert(s.sql(s"SELECT count(*) FROM $t a JOIN $t b ON a.k = b.k")
        .head.getLong(0) == 1000)
    }
  }
}
