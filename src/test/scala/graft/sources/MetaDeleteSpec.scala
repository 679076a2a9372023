package graft.sources

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import graft.etl.Snapshots
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** METADATA-ONLY DELETE contracts: a DELETE whose predicate provably
  * matches EVERY row of a file drops it from the manifest without
  * reading it — zero Spark jobs for a pure partition purge — while
  * anything unprovable (possible nulls, partial ranges) still rewrites.
  * The null case is the correctness trap this spec exists for: a
  * NULL-condition row SURVIVES a SQL DELETE, so a file with one
  * possible null must never be dropped wholesale.
  */
class MetaDeleteSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private var n = 0
  private def freshCatalog(): (String, Path) = {
    n += 1
    val cat = s"gmd$n"
    val root = Files.createTempDirectory(s"graft_gmd$n")
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, root)
  }

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  private def entriesOf(store: Path): Seq[Snapshots.ManifestEntry] =
    Snapshots.manifest(store, Snapshots.currentId(store).get)

  test("partition purge is a manifest edit: zero jobs, byte-identical carry") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (pk BIGINT, v BIGINT) PARTITIONED BY (pk)")
      s.range(0, 8000).select((col("id") % 8).as("pk"), col("id").as("v"))
        .writeTo(s"$cat.t").append()
      val store = root.resolve("t")
      val before = entriesOf(store)
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      s.sparkContext.addSparkListener(listener)
      try {
        s.sql(s"DELETE FROM $cat.t WHERE pk = 3")
        org.apache.spark.sql.GraftBridge.drainListenerBus(s.sparkContext)
      } finally s.sparkContext.removeSparkListener(listener)
      assert(jobs.get() == 0,
        s"partition purge launched ${jobs.get()} Spark job(s) — not metadata-only")
      val after = entriesOf(store)
      // exactly the _pv=3 files are gone; everything else carries
      // byte-identical (same relPath AND md5), and nothing new appeared
      val beforeBy = before.map(e => e.relPath -> e.md5).toMap
      assert(after.forall(e => beforeBy.get(e.relPath).contains(e.md5)),
        "metadata delete rewrote or added files")
      val goneFiles = before.map(_.relPath).toSet -- after.map(_.relPath).toSet
      assert(goneFiles.nonEmpty && goneFiles.forall(_.contains("_pv=3")),
        s"wrong files dropped: $goneFiles")
      assert(s.table(s"$cat.t").filter(col("pk") === 3).count() == 0L)
      assert(s.table(s"$cat.t").count() == 7000L)
      // history intact: the pre-delete snapshot still reads whole
      assert(s.sql(s"SELECT count(*) AS c FROM $cat.t VERSION AS OF " +
        s"${Snapshots.currentId(store).get - 1}").head().getLong(0) == 8000L)
    } finally rm(root)
  }

  test("zone-range drop composes with partial rewrite") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL, v BIGINT NOT NULL) " +
        "TBLPROPERTIES ('statscol'='k')")
      // range-disjoint files: [0,1000) and [1000,2000)
      s.range(0, 1000).select(col("id").as("k"), col("id").as("v"))
        .repartition(1).writeTo(s"$cat.t").append()
      s.range(1000, 2000).select(col("id").as("k"), col("id").as("v"))
        .repartition(1).writeTo(s"$cat.t").append()
      val store = root.resolve("t")
      val before = entriesOf(store)
      // k < 1500: file one drops metadata-only, file two rewrites
      s.sql(s"DELETE FROM $cat.t WHERE k < 1500")
      val after = entriesOf(store)
      val beforeBy = before.map(e => e.relPath -> e.md5).toMap
      // no carried file changed bytes; the rewritten survivor is NEW
      val (carried, freshFiles) = after.partition(e => beforeBy.contains(e.relPath))
      assert(carried.isEmpty,
        s"k<1500 should leave no original file whole, carried: ${carried.map(_.relPath)}")
      assert(freshFiles.size == 1, s"expected one rewritten file, got ${freshFiles.size}")
      assert(s.table(s"$cat.t").count() == 500L)
      assert(s.table(s"$cat.t").agg(min("k")).head().getLong(0) == 1500L)
    } finally rm(root)
  }

  test("a possible NULL voids the wholesale drop: null rows survive") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT NOT NULL) " +
        "TBLPROPERTIES ('statscol'='k')")
      // one file: k in [0,100) plus 5 NULL keys — the zone range is
      // inside the predicate but the nulls must survive
      s.range(0, 105).select(
          when(col("id") >= 100, lit(null).cast("long")).otherwise(col("id")).as("k"),
          col("id").as("v"))
        .repartition(1).writeTo(s"$cat.t").append()
      s.sql(s"DELETE FROM $cat.t WHERE k < 1000")
      val rest = s.table(s"$cat.t").collect()
      assert(rest.length == 5, s"expected the 5 null-key rows, got ${rest.length}")
      assert(rest.forall(_.isNullAt(0)))
    } finally rm(root)
  }

  test("drops commit even when every candidate survives (carry originals)") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL, v BIGINT NOT NULL) " +
        "TBLPROPERTIES ('statscol'='k')")
      // file A: all rows k=3 (zone [3,3] -> provable drop for k=3);
      // file B: rows {2,4} (zone [2,4] contains 3 -> candidate, but no
      // row actually matches)
      s.range(0, 10).select(lit(3L).as("k"), col("id").as("v"))
        .repartition(1).writeTo(s"$cat.t").append()
      s.createDataFrame(Seq((2L, 100L), (4L, 101L))).toDF("k", "v")
        .repartition(1).writeTo(s"$cat.t").append()
      val store = root.resolve("t")
      val before = entriesOf(store)
      s.sql(s"DELETE FROM $cat.t WHERE k = 3")
      val after = entriesOf(store)
      val beforeBy = before.map(e => e.relPath -> e.md5).toMap
      // the surviving file B carried byte-identical — no rewrite churn
      assert(after.size == 1 && beforeBy.get(after.head.relPath).contains(after.head.md5),
        s"expected the untouched original carried, got ${after.map(_.relPath)}")
      assert(s.table(s"$cat.t").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 4L))
    } finally rm(root)
  }
}
