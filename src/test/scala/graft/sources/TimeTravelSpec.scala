package graft.sources

import java.nio.file.{Files, Path}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.JavaConverters._

import graft.TestSpark
import graft.etl.Snapshots
import org.scalatest.funsuite.AnyFunSuite

/** `TIMESTAMP AS OF` time travel (r14): every manifest carries its
  * commit instant as a `#ts` header stamped atomically with the file
  * list; the catalog resolves an instant to the LATEST snapshot
  * committed at or before it, inclusive at the boundary. Manifests
  * predating the header (legacy stores) fall back to the immutable
  * manifest file's mtime.
  */
class TimeTravelSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private var n = 0
  private def fresh(): (String, Path) = {
    n += 1
    val cat = s"gtt$n"
    val root = Files.createTempDirectory(s"graft_tt$n")
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, root)
  }

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  /** Commit, then wait out the commit's millisecond so the NEXT commit
    * is separable by an instant.
    */
  private def tick(store: Path): Long = {
    val t = Snapshots.commitTsMillis(store, Snapshots.currentId(store).get)
    while (System.currentTimeMillis() <= t) Thread.sleep(1)
    t
  }

  test("instant resolves the latest snapshot at-or-before it, inclusive") {
    val (cat, root) = fresh()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT, v STRING)")
      s.sql(s"INSERT INTO $cat.t SELECT id, 'a' FROM range(0, 10)")
      val store = root.resolve("t")
      val t1 = tick(store)
      s.sql(s"INSERT INTO $cat.t SELECT id, 'b' FROM range(10, 30)")
      val t2 = tick(store)
      s.sql(s"DELETE FROM $cat.t WHERE k < 5")

      assert(Snapshots.idAsOfMillis(store, t1).contains(1))
      assert(Snapshots.idAsOfMillis(store, t2).contains(2))
      assert(Snapshots.idAsOfMillis(store, System.currentTimeMillis())
        .contains(Snapshots.currentId(store).get))

      def cnt(sql: String): Long = s.sql(sql).count()
      assert(cnt(s"SELECT * FROM $cat.t TIMESTAMP AS OF timestamp_millis($t1)") == 10)
      assert(cnt(s"SELECT * FROM $cat.t TIMESTAMP AS OF timestamp_millis($t2)") == 30)
      assert(cnt(s"SELECT * FROM $cat.t") == 25)
      // the instant-addressed and id-addressed reads agree row-for-row
      assert(s.sql(s"SELECT * FROM $cat.t TIMESTAMP AS OF timestamp_millis($t2) " +
        s"EXCEPT ALL SELECT * FROM $cat.t VERSION AS OF 2").isEmpty)
    } finally rm(root)
  }

  test("an instant predating the table refuses loudly") {
    val (cat, root) = fresh()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT)")
      s.sql(s"INSERT INTO $cat.t SELECT id FROM range(0, 3)")
      val store = root.resolve("t")
      val t1 = Snapshots.commitTsMillis(store, 1)
      val e = intercept[Exception] {
        s.sql(s"SELECT * FROM $cat.t TIMESTAMP AS OF " +
          s"timestamp_millis(${t1 - 86400000L})").collect()
      }
      assert(e.getMessage.contains("no snapshot committed at or before"))
    } finally rm(root)
  }

  test("a timestamp pin is read-only, like a version pin") {
    val (cat, root) = fresh()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT)")
      s.sql(s"INSERT INTO $cat.t SELECT id FROM range(0, 3)")
      val store = root.resolve("t")
      val t1 = tick(store)
      s.sql(s"INSERT INTO $cat.t SELECT id FROM range(3, 6)")
      val e = intercept[Exception] {
        s.sql(s"INSERT INTO ($cat.t TIMESTAMP AS OF timestamp_millis($t1)) VALUES (9)")
      }
      assert(e.getMessage.toLowerCase.contains("pinned") ||
        e.getMessage.toLowerCase.contains("read-only") ||
        e.getMessage.toLowerCase.contains("syntax") ||
        e.getMessage.toLowerCase.contains("time travel"))
    } finally rm(root)
  }

  test("legacy manifests without a #ts header resolve via file mtime") {
    val (cat, root) = fresh()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT)")
      s.sql(s"INSERT INTO $cat.t SELECT id FROM range(0, 7)")
      val store = root.resolve("t")
      val m1 = store.resolve("manifests").resolve("manifest-1")
      // strip the stamp the way a pre-r14 writer would have written it
      val stripped = Files.readAllLines(m1).asScala
        .filterNot(_.startsWith("#ts\t")).mkString("\n")
      Files.write(m1, stripped.getBytes(UTF_8))
      val mtime = Files.getLastModifiedTime(m1).toMillis
      assert(Snapshots.commitTsMillis(store, 1) == mtime)
      assert(Snapshots.idAsOfMillis(store, mtime).contains(1))
      assert(s.sql(s"SELECT * FROM $cat.t TIMESTAMP AS OF " +
        s"timestamp_millis(${System.currentTimeMillis()})").count() == 7)
    } finally rm(root)
  }

  test("CALL system.expire_older: age-based retention via the #ts stamps") {
    val (cat, root) = fresh()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT)")
      s.sql(s"INSERT INTO $cat.t SELECT id FROM range(0, 4)")
      val store = root.resolve("t")
      tick(store)
      s.sql(s"INSERT INTO $cat.t SELECT id FROM range(4, 9)")
      val t2 = tick(store)
      s.sql(s"INSERT INTO $cat.t SELECT id FROM range(9, 10)")
      // cutoff at commit 2's instant: snapshot 1 (strictly older) goes,
      // snapshots 2 and 3 stay
      val out = s.sql(s"CALL $cat.system.expire_older('t', ${t2}L)").collect()
      // snapshot 1's files are shared into snapshot 2 (appends reuse
      // files verbatim), so the GC reclaims the manifest but ZERO data
      // files — shared history is never yanked from under a survivor
      assert(out.head.getInt(0) == 0, s"expected 0 reclaimed files, got ${out.toSeq}")
      assert(!Files.exists(store.resolve("manifests").resolve("manifest-1")))
      assert(s.sql(s"SELECT * FROM $cat.t").count() == 10)
      assert(s.sql(s"SELECT * FROM $cat.t VERSION AS OF 2").count() == 9)
      // an instant inside the expired range no longer resolves: refused,
      // never silently served from surviving later state
      val t1gone = scala.util.Try(s.sql(
        s"SELECT * FROM $cat.t TIMESTAMP AS OF timestamp_millis(${t2 - 1})").collect())
      assert(t1gone.isFailure)
      // the current snapshot survives ANY cutoff
      val far = System.currentTimeMillis() + 86400000L
      s.sql(s"CALL $cat.system.expire_older('t', ${far}L)")
      assert(s.sql(s"SELECT * FROM $cat.t").count() == 10)
    } finally rm(root)
  }

  test("streaming starttimestamp: begin after the snapshot current at an instant") {
    val (cat, root) = fresh()
    val sink = Files.createTempDirectory("graft_tt_sink")
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT)")
      s.sql(s"INSERT INTO $cat.t SELECT id FROM range(0, 10)")
      val store = root.resolve("t")
      val t1 = tick(store)
      s.sql(s"INSERT INTO $cat.t SELECT id FROM range(10, 25)")
      // start at t1's instant: the founding 10 rows are history, only
      // the 15 later-committed rows stream
      val q = s.readStream.format("graft-snapshot")
        .option("path", store.toString)
        .option("starttimestamp", t1.toString).load()
        .writeStream.format("parquet")
        .option("path", sink.resolve("data").toString)
        .option("checkpointLocation", sink.resolve("ckpt").toString)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      assert(s.read.schema("k LONG")
        .parquet(sink.resolve("data").toString).count() == 15)
      // both start options at once refuses
      val e = intercept[Exception] {
        s.readStream.format("graft-snapshot").option("path", store.toString)
          .option("starttimestamp", t1.toString)
          .option("startsnapshot", "1").load()
      }
      assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null).take(5)
        .exists(t => Option(t.getMessage).exists(_.contains("mutually exclusive"))))
    } finally { rm(sink); rm(root) }
  }

  test("branch heads above _current are not main-line history") {
    val (cat, root) = fresh()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT)")
      s.sql(s"INSERT INTO $cat.t SELECT id FROM range(0, 4)")
      val store = root.resolve("t")
      tick(store)
      // a branch commit allocates a manifest id ABOVE the main head;
      // its instant must not satisfy a main-line TIMESTAMP AS OF
      Snapshots.createBranch(store, "dev", 1)
      Snapshots.publishToBranch(s, store, "dev",
        s.range(100, 110).withColumnRenamed("id", "k"), append = true)
      val now = System.currentTimeMillis()
      assert(Snapshots.idAsOfMillis(store, now).contains(1),
        "a branch head must not resolve as main-line history")
      assert(s.sql(s"SELECT * FROM $cat.t TIMESTAMP AS OF " +
        s"timestamp_millis($now)").count() == 4)
    } finally rm(root)
  }
}
