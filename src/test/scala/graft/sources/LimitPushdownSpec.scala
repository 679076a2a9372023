package graft.sources

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import graft.etl.Snapshots
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge contracts of the scan's LIMIT / top-N FILE pruning that the
  * oracled queries (`catalog_limit_push`, `catalog_topn_push`) don't
  * pin: the pushdown must DECLINE — never misprune — when the proof it
  * rests on is absent (no zone map for the sort column, unprovable or
  * non-zero null counts, a limit the file set can't cover), must keep
  * every file whose zone range OVERLAPS the top-k bound, and must stay
  * entirely out of the merge-on-read path (tombstoned snapshots route
  * to a different builder) while re-engaging after compaction folds the
  * tombstones away.
  */
class LimitPushdownSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private var n = 0
  private def freshCatalog(): (String, Path) = {
    n += 1
    val cat = s"glim$n"
    val root = Files.createTempDirectory(s"graft_glim$n")
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, root)
  }

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  test("LIMIT above the table's row count declines (file set can't cover it)") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL)")
      (0 until 3).foreach { i =>
        s.range(i * 100, (i + 1) * 100).select(col("id").as("k"))
          .repartition(1).writeTo(s"$cat.t").append()
      }
      val store = root.resolve("t")
      GraftScan.resetLimitPrune(store)
      val cnt = s.sql(s"SELECT count(*) AS c FROM (SELECT * FROM $cat.t LIMIT 10000)")
        .head().getLong(0)
      assert(cnt == 300L)
      assert(GraftScan.lastLimitPruneFor(store) == ((0, 0)),
        "LIMIT prune fired though no prefix covers the limit")
    } finally rm(root)
  }

  test("top-N on a column without zone maps declines; answer exact") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL, cents BIGINT NOT NULL) " +
        "TBLPROPERTIES ('statscol'='k')")
      (0 until 3).foreach { i =>
        s.range(i * 100, (i + 1) * 100)
          .select(col("id").as("k"), (lit(100000) - col("id")).as("cents"))
          .repartition(1).writeTo(s"$cat.t").append()
      }
      val store = root.resolve("t")
      GraftScan.resetLimitPrune(store)
      // cents carries no zone range (statscol is k) — must decline
      val top = s.table(s"$cat.t").orderBy(col("cents").asc).limit(5)
        .select("cents").collect().map(_.getLong(0)).toSeq
      assert(top == (99701L to 99705L).toSeq)
      assert(GraftScan.lastLimitPruneFor(store) == ((0, 0)),
        "top-N pruned files without zone evidence for the sort column")
    } finally rm(root)
  }

  test("top-N declines on a column with NULLs; null-first order survives") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT NOT NULL) " +
        "TBLPROPERTIES ('statscol'='k')")
      s.range(0, 100).select(col("id").as("k"), col("id").as("v"))
        .repartition(1).writeTo(s"$cat.t").append()
      // second file holds the NULL keys — zone maps ignore nulls, so
      // only the footer null count can prove where they are
      s.range(100, 200).select(
          when(col("id") < 105, lit(null).cast("long")).otherwise(col("id")).as("k"),
          col("id").as("v"))
        .repartition(1).writeTo(s"$cat.t").append()
      val store = root.resolve("t")
      GraftScan.resetLimitPrune(store)
      val top = s.table(s"$cat.t").orderBy(col("k").asc).limit(8)
        .select("k").collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSeq
      // ASC is NULLS FIRST: the 5 nulls lead, then 0, 1, 2
      assert(top == Seq(-1L, -1L, -1L, -1L, -1L, 0L, 1L, 2L))
      assert(GraftScan.lastLimitPruneFor(store) == ((0, 0)),
        "top-N pruned files though the sort column carries NULLs")
    } finally rm(root)
  }

  test("top-N keeps every file overlapping the bound; exact under overlap") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL) " +
        "TBLPROPERTIES ('statscol'='k')")
      // A: [0, 1000)   B: [500, 1500)   C: [2000, 3000)
      s.range(0, 1000).select(col("id").as("k"))
        .repartition(1).writeTo(s"$cat.t").append()
      s.range(500, 1500).select(col("id").as("k"))
        .repartition(1).writeTo(s"$cat.t").append()
      s.range(2000, 3000).select(col("id").as("k"))
        .repartition(1).writeTo(s"$cat.t").append()
      val store = root.resolve("t")
      GraftScan.resetLimitPrune(store)
      val got = s.table(s"$cat.t").orderBy(col("k").asc).limit(600)
        .select("k").collect().map(_.getLong(0)).toSeq
      // bound = A's zone-hi (999); B overlaps it and MUST stay, C drops
      val (kept, total) = GraftScan.lastLimitPruneFor(store)
      assert(total == 3 && kept == 2, s"expected 2 of 3 kept, saw $kept of $total")
      val expected = ((0L until 1000L) ++ (500L until 1500L)).sorted.take(600)
      assert(got == expected)

      // DESC: bound = C's zone-lo (2000); A and B both drop
      GraftScan.resetLimitPrune(store)
      val gotDesc = s.table(s"$cat.t").orderBy(col("k").desc).limit(600)
        .select("k").collect().map(_.getLong(0)).toSeq
      val (kd, td) = GraftScan.lastLimitPruneFor(store)
      assert(td == 3 && kd == 1, s"expected 1 of 3 kept, saw $kd of $td")
      val expDesc = ((0L until 1000L) ++ (500L until 1500L) ++ (2000L until 3000L))
        .sorted.reverse.take(600)
      assert(gotDesc == expDesc)
    } finally rm(root)
  }

  test("MoR snapshots never see the prune; compaction re-engages it") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL, v BIGINT NOT NULL) " +
        "TBLPROPERTIES ('morkey'='k')")
      (0 until 3).foreach { i =>
        s.range(i * 100, (i + 1) * 100).select(col("id").as("k"), col("id").as("v"))
          .repartition(1).writeTo(s"$cat.t").append()
      }
      s.sql(s"DELETE FROM $cat.t WHERE k < 10")
      val store = root.resolve("t")
      GraftScan.resetLimitPrune(store)
      val cnt = s.sql(s"SELECT count(*) AS c FROM (SELECT * FROM $cat.t LIMIT 50)")
        .head().getLong(0)
      assert(cnt == 50L)
      assert(GraftScan.lastLimitPruneFor(store) == ((0, 0)),
        "limit prune fired on a tombstoned (merge-on-read) snapshot")
      // compaction folds the tombstones; the clean snapshot prunes again
      // (two fresh appends so the prefix has something to drop)
      s.sql(s"CALL $cat.system.compact('t', 1)")
      (3 until 5).foreach { i =>
        s.range(i * 100, (i + 1) * 100).select(col("id").as("k"), col("id").as("v"))
          .repartition(1).writeTo(s"$cat.t").append()
      }
      GraftScan.resetLimitPrune(store)
      val cnt2 = s.sql(s"SELECT count(*) AS c FROM (SELECT * FROM $cat.t LIMIT 50)")
        .head().getLong(0)
      assert(cnt2 == 50L)
      val (kept, total) = GraftScan.lastLimitPruneFor(store)
      assert(total > 0 && kept < total,
        s"post-compact limit prune did not fire: kept $kept of $total")
    } finally rm(root)
  }
}
