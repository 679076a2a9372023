package graft.sources

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import graft.etl.Snapshots
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental sketch-mode ANALYZE: per-file KMV sidecars keyed by the
  * data file's md5, so a re-analyze after an append reads ONLY the new
  * files (proven by task input-bytes), the merged bottom-k estimate
  * stays within its statistical envelope, a sub-k union is EXACT, and
  * tombstoned snapshots refuse (raw-file sketches would count deleted
  * rows).
  */
class SketchAnalyzeSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private var n = 0
  private def freshCatalog(): (String, Path) = {
    n += 1
    val cat = s"gska$n"
    val root = Files.createTempDirectory(s"graft_gska$n")
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, root)
  }

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  test("estimate within envelope; sub-k union exact; served to the scan") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL, g BIGINT NOT NULL)")
      // k: 5000 distinct over 20000 rows; g: 40 distinct (sub-k: exact)
      s.range(0, 20000).select((col("id") % 5000).as("k"), (col("id") % 40).as("g"))
        .writeTo(s"$cat.t").append()
      val out = s.sql(s"CALL $cat.system.analyze('t', 'k,g', 'sketch')")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val (ndvK, nullsK) = out("k")
      assert(nullsK == 0L)
      assert(math.abs(ndvK - 5000L) <= 5000L * 20 / 100,
        s"sketch NDV $ndvK is outside 20% of 5000")
      assert(out("g")._1 == 40L, s"sub-k union must be exact, got ${out("g")._1}")
      // the scan serves the sketch numbers like exact ones
      val store = root.resolve("t")
      val served = Snapshots.colStats(store, Snapshots.currentId(store).get).get._2
      assert(served("k").ndv == ndvK && served("g").ndv == 40L)
      // ... and the `.stats` metadata table surfaces them ZERO-JOB
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      s.sparkContext.addSparkListener(listener)
      val meta = try {
        val r = s.sql(s"SELECT col_name, ndv, nulls FROM $cat.t.stats")
          .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
        org.apache.spark.sql.GraftBridge.drainListenerBus(s.sparkContext)
        r
      } finally s.sparkContext.removeSparkListener(listener)
      assert(jobs.get() == 0, s"t.stats launched ${jobs.get()} Spark job(s)")
      assert(meta("k") == ((ndvK, 0L)) && meta("g") == ((40L, 0L)),
        s"t.stats diverged from the sidecar: $meta")
    } finally rm(root)
  }

  test("re-analyze after an append reads only the NEW files") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL)")
      s.range(0, 50000).select(col("id").as("k"))
        .repartition(4).writeTo(s"$cat.t").append()
      s.sql(s"CALL $cat.system.analyze('t', 'k', 'sketch')").collect()
      val store = root.resolve("t")
      val oldBytes = Snapshots.manifest(store, Snapshots.currentId(store).get)
        .map(_.bytes).sum
      // a small second append
      s.range(50000, 51000).select(col("id").as("k"))
        .repartition(1).writeTo(s"$cat.t").append()
      val newBytes = Snapshots.manifest(store, Snapshots.currentId(store).get)
        .map(_.bytes).sum - oldBytes
      val read = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            read.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
      }
      s.sparkContext.addSparkListener(listener)
      val out2 = try {
        val r = s.sql(s"CALL $cat.system.analyze('t', 'k', 'sketch')").collect()
        org.apache.spark.sql.GraftBridge.drainListenerBus(s.sparkContext)
        r
      } finally s.sparkContext.removeSparkListener(listener)
      assert(read.get() < oldBytes,
        s"incremental re-analyze read ${read.get()} bytes — more than the " +
          s"pre-append table ($oldBytes); it rescanned old files")
      assert(read.get() > 0 && read.get() <= newBytes * 4,
        s"expected ~${newBytes} bytes read (new files only), saw ${read.get()}")
      // the refreshed estimate sees the appended keys
      val ndv2 = out2.head.getLong(1)
      assert(math.abs(ndv2 - 51000L) <= 51000L * 20 / 100,
        s"refreshed NDV $ndv2 outside 20% of 51000")
    } finally rm(root)
  }

  test("tombstoned snapshots refuse sketch mode") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL, v BIGINT NOT NULL) " +
        "TBLPROPERTIES ('morkey'='k')")
      s.range(0, 100).select(col("id").as("k"), col("id").as("v"))
        .writeTo(s"$cat.t").append()
      s.sql(s"DELETE FROM $cat.t WHERE k < 10")
      val e = intercept[Exception] {
        s.sql(s"CALL $cat.system.analyze('t', 'k', 'sketch')").collect()
      }
      assert(e.getMessage.contains("sketch-mode analyze on a tombstoned"),
        s"wrong refusal: ${e.getMessage}")
      // exact mode still works on the merged view
      val exact = s.sql(s"CALL $cat.system.analyze('t', 'k', 'exact')")
        .collect().head
      assert(exact.getLong(1) == 90L)
    } finally rm(root)
  }
}
