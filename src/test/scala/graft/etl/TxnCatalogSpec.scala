package graft.etl

import java.nio.file.{Files, Path}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import scala.collection.JavaConverters._

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Cross-table transactions: the conservation hammer (no reader ever
  * sees a half-moved row across tables), version conflicts, staged-id
  * validation, and full-history time travel — beyond what the oracled
  * `snapshot_txn` relation shows.
  */
class TxnCatalogSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private def tmpCat(): Path = Files.createTempDirectory("graft_txnspec")

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  private def rows(tags: Range) = {
    val sq = s; import sq.implicits._
    tags.flatMap(t => (0 until 100).map(i => (t.toLong, i.toLong))).toDF("tag", "i")
  }

  test("conservation hammer: a concurrent reader never sees a half-moved batch across tables") {
    val cat = tmpCat()
    try {
      val hotId = Snapshots.stageOnto(s, TxnCatalog.tableRoot(cat, "hot"), rows(1 to 10), None)
      val coldId = Snapshots.stageOnto(s, TxnCatalog.tableRoot(cat, "cold"), rows(0 to 0), None)
      TxnCatalog.commit(cat, Map("hot" -> hotId, "cold" -> coldId), None)
      val total = 1100L
      val stop = new AtomicBoolean(false)
      val torn = new AtomicInteger(0)
      val reads = new AtomicInteger(0)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      val reader = pool.submit(new Runnable { def run(): Unit =
        while (!stop.get()) {
          // ONE version resolve, both tables read AT it — the consistent
          // multi-table read path the scaladoc prescribes
          val v = TxnCatalog.version(cat).get
          val n = TxnCatalog.readTableAt(s, cat, "hot", v).count() +
            TxnCatalog.readTableAt(s, cat, "cold", v).count()
          reads.incrementAndGet()
          if (n != total) torn.incrementAndGet()
        }
      })
      // 10 move-transactions: tag t leaves hot and lands in cold
      val writer = pool.submit(new Runnable { def run(): Unit =
        (1 to 10).foreach { t =>
          val sq = s; import sq.implicits._
          val v = TxnCatalog.version(cat).get
          val m = TxnCatalog.mapping(cat, v)
          val movedRows = rows(t to t)
          val h = Snapshots.stageDeletesOnto(s, TxnCatalog.tableRoot(cat, "hot"),
            Seq(t.toLong).toDF("tag"), m("hot"))
          val c = Snapshots.stageOnto(s, TxnCatalog.tableRoot(cat, "cold"),
            movedRows, Some(m("cold")))
          TxnCatalog.commit(cat, Map("hot" -> h, "cold" -> c), Some(v))
        }
      })
      writer.get(300, java.util.concurrent.TimeUnit.SECONDS)
      stop.set(true); reader.get(); pool.shutdown()
      assert(torn.get() == 0, s"${torn.get()} torn cross-table reads of ${reads.get()}")
      assert(reads.get() > 0)
      assert(TxnCatalog.readTable(s, cat, "hot").count() == 0L)
      assert(TxnCatalog.readTable(s, cat, "cold").count() == total)
    } finally rm(cat)
  }

  test("a transaction staged against a superseded version conflicts; retry from the new version lands") {
    val sq = s; import sq.implicits._
    val cat = tmpCat()
    try {
      val a = Snapshots.stageOnto(s, TxnCatalog.tableRoot(cat, "t"), rows(1 to 2), None)
      val v1 = TxnCatalog.commit(cat, Map("t" -> a), None)
      // txn X stages against v1…
      val x = Snapshots.stageDeletesOnto(s, TxnCatalog.tableRoot(cat, "t"),
        Seq(1L).toDF("tag"), TxnCatalog.mapping(cat, v1)("t"))
      // …then txn Y lands first
      val y = Snapshots.stageDeletesOnto(s, TxnCatalog.tableRoot(cat, "t"),
        Seq(2L).toDF("tag"), TxnCatalog.mapping(cat, v1)("t"))
      val v2 = TxnCatalog.commit(cat, Map("t" -> y), Some(v1))
      intercept[Snapshots.CommitConflictException] {
        TxnCatalog.commit(cat, Map("t" -> x), Some(v1))
      }
      // X's naive overlay would have RESURRECTED tag 2 (its staged
      // manifest carries v1's files without Y's tombstone) — exactly
      // why the conflict is mandatory. Restage from v2 and retry:
      val x2 = Snapshots.stageDeletesOnto(s, TxnCatalog.tableRoot(cat, "t"),
        Seq(1L).toDF("tag"), TxnCatalog.mapping(cat, v2)("t"))
      TxnCatalog.commit(cat, Map("t" -> x2), Some(v2))
      assert(TxnCatalog.readTable(s, cat, "t").count() == 0L)
    } finally rm(cat)
  }

  test("concurrent transactions staging onto the SAME table get distinct manifests") {
    val cat = tmpCat()
    try {
      val base = Snapshots.stageOnto(s, TxnCatalog.tableRoot(cat, "t"), rows(0 to 0), None)
      TxnCatalog.commit(cat, Map("t" -> base), None)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      val tasks = (1 to 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] { def call(): Int =
          Snapshots.stageOnto(s, TxnCatalog.tableRoot(cat, "t"), rows(i to i), Some(base))
        })
      }
      val ids = tasks.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      pool.shutdown()
      assert(ids.distinct.size == 8, s"staged-id collision: ${ids.sorted}")
      // every staged manifest holds ITS OWN content (base + one tag)
      ids.foreach { id =>
        val n = Snapshots.readAt(s, TxnCatalog.tableRoot(cat, "t"), id).count()
        assert(n == 200L, s"staged manifest $id holds wrong content: $n rows")
      }
    } finally rm(cat)
  }

  test("commit refuses staged ids with no manifest and empty transactions") {
    val cat = tmpCat()
    try {
      val a = Snapshots.stageOnto(s, TxnCatalog.tableRoot(cat, "t"), rows(1 to 1), None)
      TxnCatalog.commit(cat, Map("t" -> a), None)
      intercept[IllegalArgumentException] {
        TxnCatalog.commit(cat, Map("t" -> 99), TxnCatalog.version(cat))
      }
      intercept[IllegalArgumentException] {
        TxnCatalog.commit(cat, Map.empty, TxnCatalog.version(cat))
      }
    } finally rm(cat)
  }

  test("catalog expire reclaims only what expired versions alone reached; retained reads intact") {
    val sq = s; import sq.implicits._
    val cat = tmpCat()
    try {
      val h = Snapshots.stageOnto(s, TxnCatalog.tableRoot(cat, "hot"), rows(1 to 3), None)
      val c = Snapshots.stageOnto(s, TxnCatalog.tableRoot(cat, "cold"), rows(0 to 0), None)
      TxnCatalog.commit(cat, Map("hot" -> h, "cold" -> c), None)
      (1 to 3).foreach { t =>
        val v = TxnCatalog.version(cat).get
        val m = TxnCatalog.mapping(cat, v)
        TxnCatalog.commit(cat, Map(
          "hot" -> Snapshots.stageDeletesOnto(s, TxnCatalog.tableRoot(cat, "hot"),
            Seq(t.toLong).toDF("tag"), m("hot")),
          "cold" -> Snapshots.stageOnto(s, TxnCatalog.tableRoot(cat, "cold"),
            rows(t to t), Some(m("cold")))), Some(v))
      }
      // a catalog-level compaction of cold: full replace staged on no base
      val v4 = TxnCatalog.version(cat).get
      val compacted = Snapshots.stageOnto(s, TxnCatalog.tableRoot(cat, "cold"),
        TxnCatalog.readTableAt(s, cat, "cold", v4).repartition(2), None)
      val v5 = TxnCatalog.commit(cat, Map("cold" -> compacted), Some(v4))
      val (files, bytes) = TxnCatalog.expire(cat, keepFrom = v5)
      assert(files > 0 && bytes > 0, "pre-compaction cold chain was not reclaimed")
      // retained state intact and conserving; expired versions gone
      assert(TxnCatalog.readTableAt(s, cat, "cold", v5).count() == 400L)
      assert(TxnCatalog.readTableAt(s, cat, "hot", v5).count() == 0L)
      assert(!Files.exists(cat.resolve("versions").resolve("version-1")))
      intercept[Exception] { TxnCatalog.readTableAt(s, cat, "cold", 1).count() }
    } finally rm(cat)
  }

  test("every historical catalog version stays readable and conserving") {
    val sq = s; import sq.implicits._
    val cat = tmpCat()
    try {
      val h = Snapshots.stageOnto(s, TxnCatalog.tableRoot(cat, "hot"), rows(1 to 4), None)
      val c = Snapshots.stageOnto(s, TxnCatalog.tableRoot(cat, "cold"), rows(0 to 0), None)
      TxnCatalog.commit(cat, Map("hot" -> h, "cold" -> c), None)
      (1 to 4).foreach { t =>
        val v = TxnCatalog.version(cat).get
        val m = TxnCatalog.mapping(cat, v)
        TxnCatalog.commit(cat, Map(
          "hot" -> Snapshots.stageDeletesOnto(s, TxnCatalog.tableRoot(cat, "hot"),
            Seq(t.toLong).toDF("tag"), m("hot")),
          "cold" -> Snapshots.stageOnto(s, TxnCatalog.tableRoot(cat, "cold"),
            rows(t to t), Some(m("cold")))), Some(v))
      }
      (1 to 5).foreach { v =>
        val hot = TxnCatalog.readTableAt(s, cat, "hot", v).count()
        val cold = TxnCatalog.readTableAt(s, cat, "cold", v).count()
        assert(hot + cold == 500L, s"version $v leaks rows: $hot + $cold")
        assert(cold == (v - 1) * 100L + 100L, s"version $v cold drifted: $cold")
      }
    } finally rm(cat)
  }
}
