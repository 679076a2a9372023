package graft.sources

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import graft.etl.Snapshots
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The GraftCatalog DSv2 TableCatalog: SQL DDL/DML over the snapshot
  * layer — CREATE/SHOW/ALTER/DROP/RENAME, INSERT INTO as appended
  * releases reusing prior files, INSERT OVERWRITE as a rewrite commit
  * with history intact, VERSION AS OF time travel by id and by ref
  * name, plan-time zone-map skipping through the DSv2 parquet scan,
  * and the loud contracts (tombstone refusal, pinned-view writes,
  * partitioned CREATE).
  */
class GraftCatalogSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  /** Each test gets its own catalog name + warehouse dir: catalog
    * instances cache per session by name, so a fresh name guarantees a
    * fresh root.
    */
  private var n = 0
  private def freshCatalog(): (String, Path) = {
    n += 1
    val cat = s"gcat$n"
    val root = Files.createTempDirectory(s"graft_cat$n")
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, root)
  }

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  private def scanOf(df: DataFrame): BatchScanExec = {
    def find(p: org.apache.spark.sql.execution.SparkPlan): Option[BatchScanExec] =
      p match {
        case b: BatchScanExec         => Some(b)
        case a: AdaptiveSparkPlanExec => find(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => find(q.plan)
        case other => other.children.view.flatMap(find(_)).headOption
      }
    find(df.queryExecution.executedPlan).getOrElse(
      throw new IllegalStateException(
        s"no DSv2 scan in plan:\n${df.queryExecution.executedPlan}"))
  }

  test("SQL lifecycle: create, insert (append reuses files), overwrite, time travel") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE NAMESPACE $cat.gold")
      s.sql(s"CREATE TABLE $cat.gold.kv (k BIGINT, v STRING)")
      assert(s.sql(s"SHOW TABLES IN $cat.gold").collect().map(_.getString(1)).toSeq == Seq("kv"))
      assert(s.sql(s"SELECT * FROM $cat.gold.kv").count() == 0, "fresh table reads empty")

      s.sql(s"INSERT INTO $cat.gold.kv SELECT id, concat('v', id) FROM range(0, 100)")
      s.sql(s"INSERT INTO $cat.gold.kv SELECT id, concat('v', id) FROM range(100, 150)")
      val store = root.resolve("gold").resolve("kv")
      val files1 = Snapshots.manifest(store, 1).map(_.relPath).toSet
      val files2 = Snapshots.manifest(store, 2).map(_.relPath).toSet
      assert(files1.subsetOf(files2), "append must reuse release 1's files verbatim")
      assert(s.sql(s"SELECT count(*) c, sum(k) sk FROM $cat.gold.kv").head.toSeq ==
        Seq(150L, (0L until 150).sum))

      s.sql(s"INSERT OVERWRITE $cat.gold.kv SELECT id, 'x' FROM range(0, 7)")
      assert(s.sql(s"SELECT count(*) FROM $cat.gold.kv").head.getLong(0) == 7)
      // history intact: snapshot 2 still reads the 150-row state
      assert(s.sql(s"SELECT count(*) FROM $cat.gold.kv VERSION AS OF 2").head.getLong(0) == 150)
      assert(s.sql(s"SELECT count(*) FROM $cat.gold.kv VERSION AS OF 1").head.getLong(0) == 100)
      // a named ref resolves through VERSION AS OF too
      Snapshots.createTag(store, "before_rewrite", 2)
      assert(s.sql(s"SELECT count(*) FROM $cat.gold.kv VERSION AS OF 'before_rewrite'")
        .head.getLong(0) == 150)
    } finally rm(root)
  }

  test("plan-time zone-map skipping and parquet pushdown through the catalog scan") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.zt (k BIGINT, v BIGINT) TBLPROPERTIES ('statscol'='k')")
      // range-clustered insert → disjoint per-file k ranges in the manifest
      s.range(0, 8000).select(col("id").as("k"), (col("id") * 3).as("v"))
        .repartitionByRange(8, col("k"))
        .writeTo(s"$cat.zt").append()
      val store = root.resolve("zt")
      assert(Snapshots.manifest(store, 1).forall(_.stats.isDefined),
        "statscol property must land legacy zone maps at write time")
      val q = s.sql(s"SELECT sum(v) sv, count(*) c FROM $cat.zt WHERE k BETWEEN 1000 AND 1999")
      val out = q.head
      assert(out.getLong(1) == 1000)
      assert(out.getLong(0) == (1000L until 2000).map(_ * 3).sum)
      val exec = scanOf(q)
      val scan = exec.scan.asInstanceOf[GraftScan].parquet
      val opened = exec.inputPartitions
        .collect { case fp: org.apache.spark.sql.execution.datasources.FilePartition => fp }
        .flatMap(_.files).map(_.filePath.toString).distinct.size
      val total = Snapshots.manifest(store, 1).size
      assert(opened < total, s"zone maps skipped nothing: opened $opened of $total")
      assert(scan.pushedFilters.mkString(",").contains("GreaterThanOrEqual(k,1000)"),
        s"predicate missing from parquet pushdown: ${scan.pushedFilters.mkString(",")}")
    } finally rm(root)
  }

  test("column pruning reaches the catalog scan") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.pr (a BIGINT, b STRING, c DOUBLE)")
      s.sql(s"INSERT INTO $cat.pr SELECT id, 'x', 0.5 FROM range(0, 10)")
      val q = s.sql(s"SELECT a FROM $cat.pr")
      val scan = scanOf(q).scan.asInstanceOf[GraftScan].parquet
      assert(scan.readDataSchema.fieldNames.toSeq == Seq("a"),
        s"scan reads ${scan.readDataSchema.fieldNames.mkString(",")} for a 1-column projection")
    } finally rm(root)
  }

  test("schema is enforced on INSERT; partitioned CREATE and pinned writes refuse loudly") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.en (k BIGINT, v STRING)")
      intercept[org.apache.spark.sql.AnalysisException] {
        s.sql(s"INSERT INTO $cat.en SELECT id FROM range(0, 5)") // missing column
      }
      // single-identity partitioning is supported (GraftPartitionedSpec);
      // multi-column partitioning still refuses loudly
      intercept[Exception] {
        s.sql(s"CREATE TABLE $cat.pt (k BIGINT, p STRING, q STRING) PARTITIONED BY (p, q)")
      }
      s.sql(s"INSERT INTO $cat.en SELECT id, 'a' FROM range(0, 5)")
      val e = intercept[Exception] {
        s.sql(s"INSERT INTO $cat.en VERSION AS OF 1 SELECT id, 'b' FROM range(0, 5)")
      }
      // whether Spark's parser or our pinned-table guard rejects it,
      // a historical view must not be writable
      assert(s.sql(s"SELECT count(*) FROM $cat.en").head.getLong(0) == 5)
    } finally rm(root)
  }

  test("tombstone-bearing snapshots are refused by the catalog scan") {
    val (cat, root) = freshCatalog()
    try {
      val sq = s; import sq.implicits._
      s.sql(s"CREATE TABLE $cat.tb (k BIGINT, v STRING)")
      s.sql(s"INSERT INTO $cat.tb SELECT id, 'x' FROM range(0, 20)")
      val store = root.resolve("tb")
      Snapshots.publishDeletes(s, store, Seq(3L, 4L).toDF("k"))
      val e = intercept[Exception] { s.sql(s"SELECT * FROM $cat.tb").collect() }
      assert(e.getMessage.contains("tombstone"), s"wrong refusal: ${e.getMessage}")
      // compaction folds the tombstones in and restores scannability
      Snapshots.compact(s, store, targetFiles = 2)
      assert(s.sql(s"SELECT count(*) FROM $cat.tb").head.getLong(0) == 18)
    } finally rm(root)
  }

  test("ALTER TABLE: ADD COLUMN surfaces NULL on pre-evolution rows; properties round-trip") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.ev (k BIGINT)")
      s.sql(s"INSERT INTO $cat.ev SELECT id FROM range(0, 10)")
      s.sql(s"ALTER TABLE $cat.ev ADD COLUMN lang STRING")
      s.sql(s"INSERT INTO $cat.ev SELECT id, 'en' FROM range(10, 15)")
      val rows = s.sql(
        s"SELECT count(*) c, count(lang) cl, sum(k) sk FROM $cat.ev").head
      assert(rows.getLong(0) == 15 && rows.getLong(1) == 5,
        "pre-evolution rows must surface the added column as NULL")
      assert(rows.getLong(2) == (0L until 15).sum)
      s.sql(s"ALTER TABLE $cat.ev SET TBLPROPERTIES ('statscol'='k')")
      val (_, props) = GraftCatalog.readMarker(root.resolve("ev"))
      assert(props.get("statscol").contains("k"))
      intercept[Exception] { s.sql(s"ALTER TABLE $cat.ev DROP COLUMN k") }
    } finally rm(root)
  }

  test("namespaces, rename, drop") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE NAMESPACE $cat.a")
      s.sql(s"CREATE NAMESPACE $cat.b")
      assert(s.sql(s"SHOW NAMESPACES IN $cat").collect().map(_.getString(0)).sorted.toSeq
        == Seq("a", "b"))
      s.sql(s"CREATE TABLE $cat.a.t1 (k BIGINT)")
      s.sql(s"INSERT INTO $cat.a.t1 SELECT id FROM range(0, 9)")
      s.sql(s"ALTER TABLE $cat.a.t1 RENAME TO $cat.b.t2")
      assert(!Files.exists(root.resolve("a").resolve("t1")))
      assert(s.sql(s"SELECT count(*) FROM $cat.b.t2").head.getLong(0) == 9)
      assert(s.sql(s"SHOW TABLES IN $cat.a").count() == 0)
      s.sql(s"DROP TABLE $cat.b.t2")
      assert(!Files.exists(root.resolve("b").resolve("t2")))
      intercept[Exception] { s.sql(s"SELECT * FROM $cat.b.t2").collect() }
      // dropping a non-empty namespace needs CASCADE
      s.sql(s"CREATE TABLE $cat.a.t3 (k BIGINT)")
      intercept[Exception] { s.sql(s"DROP NAMESPACE $cat.a") }
      s.sql(s"DROP NAMESPACE $cat.a CASCADE")
      assert(!Files.exists(root.resolve("a")))
    } finally rm(root)
  }

  test("DELETE FROM is copy-on-write and surgical: only candidate files rewritten") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.d (k BIGINT, v STRING) TBLPROPERTIES ('statscol'='k')")
      s.range(0, 8000).select(col("id").as("k"), concat(lit("v"), col("id")).as("v"))
        .repartitionByRange(8, col("k"))
        .writeTo(s"$cat.d").append()
      val store = root.resolve("d")
      val before = Snapshots.manifest(store, 1)
      s.sql(s"DELETE FROM $cat.d WHERE k BETWEEN 100 AND 199")
      assert(Snapshots.currentId(store).contains(2))
      val after = Snapshots.manifest(store, 2)
      // SURGICAL: zone maps localize the range to a strict subset of
      // files; every untouched file is carried byte-identical (same
      // relPath + md5 + ORIGINAL seq)
      val carried = after.filter(e => before.exists(_.relPath == e.relPath))
      assert(carried.nonEmpty, "no file was carried — delete rewrote everything")
      carried.foreach { e =>
        val orig = before.find(_.relPath == e.relPath).get
        assert(e.md5 == orig.md5 && e.seq == orig.seq,
          s"carried file ${e.relPath} was re-stamped")
      }
      assert(after.map(_.relPath).toSet != before.map(_.relPath).toSet)
      assert(s.sql(s"SELECT count(*) FROM $cat.d").head.getLong(0) == 7900)
      assert(s.sql(s"SELECT count(*) FROM $cat.d WHERE k BETWEEN 100 AND 199")
        .head.getLong(0) == 0)
      // history intact: the pre-delete snapshot still reads whole
      assert(s.sql(s"SELECT count(*) FROM $cat.d VERSION AS OF 1").head.getLong(0) == 8000)
      // rewritten files re-carry zone maps → the post-delete scan still skips
      val q = s.sql(s"SELECT count(*) c FROM $cat.d WHERE k < 50")
      assert(q.head.getLong(0) == 50)
      val opened = scanOf(q).inputPartitions
        .collect { case fp: org.apache.spark.sql.execution.datasources.FilePartition => fp }
        .flatMap(_.files).map(_.filePath.toString).distinct.size
      assert(opened < after.size, s"post-delete scan opened $opened of ${after.size}")
    } finally rm(root)
  }

  test("DELETE semantics: NULL-condition rows survive; no-match commits nothing; emptying works") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.dn (k BIGINT, v BIGINT)")
      s.sql(s"INSERT INTO $cat.dn VALUES (1, 10), (2, NULL), (3, 30)")
      val store = root.resolve("dn")
      // v > 15 is NULL for k=2: SQL DELETE removes only TRUE rows
      s.sql(s"DELETE FROM $cat.dn WHERE v > 15")
      assert(s.sql(s"SELECT k FROM $cat.dn ORDER BY k").collect().map(_.getLong(0)).toSeq
        == Seq(1L, 2L))
      val id = Snapshots.currentId(store).get
      // no row matches → NO new snapshot, nothing staged left behind
      s.sql(s"DELETE FROM $cat.dn WHERE k = 999")
      assert(Snapshots.currentId(store).contains(id), "no-match delete moved the pointer")
      // a delete can empty the table; the store stays readable
      s.sql(s"DELETE FROM $cat.dn WHERE k IS NOT NULL")
      assert(s.sql(s"SELECT count(*) FROM $cat.dn").head.getLong(0) == 0)
      s.sql(s"INSERT INTO $cat.dn VALUES (7, 70)")
      assert(s.sql(s"SELECT count(*) FROM $cat.dn").head.getLong(0) == 1)
    } finally rm(root)
  }

  test("DELETE conflicts with a concurrent commit and retries from the new base") {
    val (cat, root) = freshCatalog()
    try {
      val sq = s; import sq.implicits._
      s.sql(s"CREATE TABLE $cat.dc (k BIGINT, v STRING)")
      s.sql(s"INSERT INTO $cat.dc SELECT id, 'x' FROM range(0, 100)")
      val store = root.resolve("dc")
      // land a concurrent append between the delete's read and commit by
      // racing a thread; the retry loop must converge with BOTH effects
      val t = new Thread(() => {
        Snapshots.publishOcc(s, store, (100L until 120L).map(i => (i, "occ")).toDF("k", "v"))
      })
      t.start()
      s.sql(s"DELETE FROM $cat.dc WHERE k < 10")
      t.join()
      val n = s.sql(s"SELECT count(*) FROM $cat.dc").head.getLong(0)
      assert(n == 110, s"expected 90 survivors + 20 appended, got $n")
      assert(s.sql(s"SELECT count(*) FROM $cat.dc WHERE k < 10").head.getLong(0) == 0)
    } finally rm(root)
  }

  test("UPDATE is group-based copy-on-write: zone maps bound the rewrite to affected files") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.u (k BIGINT, v BIGINT) TBLPROPERTIES ('statscol'='k')")
      s.range(0, 8000).select(col("id").as("k"), col("id").as("v"))
        .repartitionByRange(8, col("k"))
        .writeTo(s"$cat.u").append()
      val store = root.resolve("u")
      val before = Snapshots.manifest(store, 1)
      s.sql(s"UPDATE $cat.u SET v = v * 10 WHERE k BETWEEN 2000 AND 2999")
      assert(Snapshots.currentId(store).contains(2), "UPDATE must land one commit")
      val after = Snapshots.manifest(store, 2)
      // surgical: files whose k-range the condition zone-map-skips are
      // carried byte-identical with their ORIGINAL seq stamps
      val carried = after.filter(e => before.exists(b =>
        b.relPath == e.relPath && b.md5 == e.md5 && b.seq == e.seq))
      assert(carried.nonEmpty, "UPDATE rewrote the whole table despite zone maps")
      assert(after.size >= before.size - carried.size,
        "replacement lost files")
      // values: exactly the matched rows updated, everything else intact
      val r = s.sql(s"SELECT sum(v) sv, count(*) c FROM $cat.u").head
      val expect = (0L until 8000).map(i => if (i >= 2000 && i <= 2999) i * 10 else i).sum
      assert(r.getLong(1) == 8000 && r.getLong(0) == expect)
      // history: pre-update snapshot unchanged
      assert(s.sql(s"SELECT sum(v) FROM $cat.u VERSION AS OF 1").head.getLong(0)
        == (0L until 8000).sum)
      // rewritten files re-carry zone maps: post-update scans still skip
      val q = s.sql(s"SELECT count(*) c FROM $cat.u WHERE k < 100")
      q.collect()
      val opened = scanOf(q).inputPartitions
        .collect { case fp: org.apache.spark.sql.execution.datasources.FilePartition => fp }
        .flatMap(_.files).map(_.filePath.toString).distinct.size
      assert(opened < after.size, s"post-update scan opened $opened of ${after.size}")
    } finally rm(root)
  }

  test("MERGE INTO: matched update, matched delete, not-matched insert in one atomic commit") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.m (k BIGINT, v STRING, cents BIGINT)")
      s.sql(s"INSERT INTO $cat.m SELECT id, 'old', id * 100 FROM range(0, 100)")
      val store = root.resolve("m")
      // source: updates for 10-19, deletes for 20-24, inserts for 200-204
      s.sql(
        s"""MERGE INTO $cat.m t
           |USING (SELECT id AS k, CASE WHEN id < 200 THEN 'upd' ELSE 'new' END AS v,
           |              id * 7 AS cents,
           |              id >= 20 AND id < 25 AS is_del
           |       FROM range(10, 25)
           |       UNION ALL
           |       SELECT id, 'new', id * 7, false FROM range(200, 205)) s
           |ON t.k = s.k
           |WHEN MATCHED AND s.is_del THEN DELETE
           |WHEN MATCHED THEN UPDATE SET v = s.v, cents = s.cents
           |WHEN NOT MATCHED THEN INSERT (k, v, cents) VALUES (s.k, s.v, s.cents)
           |""".stripMargin)
      assert(Snapshots.currentId(store).contains(2), "MERGE must land ONE commit")
      val got = s.sql(s"SELECT k, v, cents FROM $cat.m ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      val expect =
        (0L until 10).map(i => (i, "old", i * 100)) ++
        (10L until 20).map(i => (i, "upd", i * 7)) ++
        (25L until 100).map(i => (i, "old", i * 100)) ++
        (200L until 205).map(i => (i, "new", i * 7))
      assert(got == expect, s"MERGE result diverged: got ${got.size}, expect ${expect.size}")
      // history intact
      assert(s.sql(s"SELECT count(*) FROM $cat.m VERSION AS OF 1").head.getLong(0) == 100)
    } finally rm(root)
  }

  test("rewrite scan reads kept files WHOLE: no parquet page/row-group filtering row loss") {
    // Regression: parquet's column-index pages hold 20k rows by default;
    // if the UPDATE condition reaches the reader, the non-matching
    // trailing page of a >20k-row candidate file is silently dropped and
    // the commit LOSES its rows. The rewrite scan must prune FILES only.
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.pg (k BIGINT, v BIGINT)")
      // one file, 25k rows: spans two 20k-row column-index pages
      s.range(0, 25000).select(col("id").as("k"), col("id").as("v"))
        .coalesce(1).writeTo(s"$cat.pg").append()
      assert(Snapshots.manifest(root.resolve("pg"), 1).size == 1)
      s.sql(s"UPDATE $cat.pg SET v = -1 WHERE k < 10") // matches page 1 only
      val r = s.sql(s"SELECT count(*) c, sum(k) sk FROM $cat.pg").head
      assert(r.getLong(0) == 25000,
        s"rewrite lost rows to reader-level filtering: ${r.getLong(0)} of 25000")
      assert(r.getLong(1) == (0L until 25000).sum)
      assert(s.sql(s"SELECT count(*) FROM $cat.pg WHERE v = -1").head.getLong(0) == 10)
    } finally rm(root)
  }

  test("DELETE with a subquery condition takes the group-based rewrite path") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.sq (k BIGINT, v BIGINT)")
      s.sql(s"INSERT INTO $cat.sq SELECT id, id % 7 FROM range(0, 100)")
      s.sql(s"CREATE TABLE $cat.bad (k BIGINT)")
      s.sql(s"INSERT INTO $cat.bad VALUES (3), (5), (98)")
      // subquery conditions are untranslatable to source filters —
      // canDeleteWhere refuses, SupportsRowLevelOperations handles it
      s.sql(s"DELETE FROM $cat.sq WHERE k IN (SELECT k FROM $cat.bad)")
      assert(s.sql(s"SELECT count(*) FROM $cat.sq").head.getLong(0) == 97)
      assert(s.sql(s"SELECT count(*) FROM $cat.sq WHERE k IN (3,5,98)").head.getLong(0) == 0)
    } finally rm(root)
  }

  test("readStream.table: snapshot-id offsets, mid-stream increment, exactly-once") {
    val (cat, root) = freshCatalog()
    val sink = s"cat_stream_$n"
    try {
      s.sql(s"CREATE TABLE $cat.ev (k BIGINT, v BIGINT)")
      s.sql(s"INSERT INTO $cat.ev SELECT id, id * 2 FROM range(0, 50)")
      s.sql(s"INSERT INTO $cat.ev SELECT id, id * 2 FROM range(50, 80)")
      val q = s.readStream.table(s"$cat.ev")
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(s.table(sink).count() == 80, "first drain must deliver both releases")
        // mid-stream increment: the DSv2 offset advances with the pointer
        s.sql(s"INSERT INTO $cat.ev SELECT id, id * 2 FROM range(80, 100)")
        q.processAllAvailable()
      } finally q.stop()
      val got = s.table(sink)
      assert(got.count() == 100, s"expected exactly-once 100 rows, got ${got.count()}")
      assert(got.agg(sum(col("k"))).head.getLong(0) == (0L until 100).sum)
    } finally rm(root)
  }

  test("readStream.table: checkpointed restart resumes from the committed snapshot offset") {
    val (cat, root) = freshCatalog()
    val ckpt = Files.createTempDirectory("cat_stream_ck")
    val out = Files.createTempDirectory("cat_stream_out")
    try {
      s.sql(s"CREATE TABLE $cat.cs (k BIGINT)")
      s.sql(s"INSERT INTO $cat.cs SELECT id FROM range(0, 40)")
      def drain(): Unit = {
        val q = s.readStream.table(s"$cat.cs")
          .writeStream.format("parquet").option("path", out.toString)
          .option("checkpointLocation", ckpt.toString).outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      drain()
      assert(s.read.parquet(out.toString).count() == 40)
      s.sql(s"INSERT INTO $cat.cs SELECT id FROM range(40, 55)")
      drain() // a NEW query on the same checkpoint must deliver ONLY the increment
      val rows = s.read.parquet(out.toString)
      assert(rows.count() == 55, s"restart duplicated or dropped: ${rows.count()}")
      assert(rows.agg(sum(col("k"))).head.getLong(0) == (0L until 55).sum)
    } finally { rm(root); rm(ckpt); rm(out) }
  }

  test("readStream.table fails loudly when a rewrite lands mid-window") {
    val (cat, root) = freshCatalog()
    val sink = s"cat_rw_$n"
    try {
      s.sql(s"CREATE TABLE $cat.rw (k BIGINT)")
      s.sql(s"INSERT INTO $cat.rw SELECT id FROM range(0, 30)")
      val q = s.readStream.table(s"$cat.rw")
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(s.table(sink).count() == 30)
        Snapshots.compact(s, root.resolve("rw"), targetFiles = 1)
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
          q.awaitTermination(2000)
        }
        assert(e.getMessage.contains("not append-only") ||
          Option(e.getCause).exists(_.getMessage.contains("not append-only")),
          s"wrong failure: ${e.getMessage}")
      } finally if (q.isActive) q.stop()
    } finally rm(root)
  }

  test("review fixes: concurrent first INSERTs, name collisions, marker escaping, empty meta") {
    val (cat, root) = freshCatalog()
    try {
      // (1) two concurrent FIRST inserts on a fresh table must BOTH land
      // (the append-vs-found decision is OCC, not a TOCTOU outside the lock)
      s.sql(s"CREATE TABLE $cat.race (k BIGINT)")
      val ts = Seq(0L, 1000L).map { base =>
        val t = new Thread(() =>
          s.sql(s"INSERT INTO $cat.race SELECT id + $base FROM range(0, 100)"))
        t.start(); t
      }
      ts.foreach(_.join())
      assert(s.sql(s"SELECT count(*) FROM $cat.race").head.getLong(0) == 200,
        "a concurrent founding INSERT was silently replaced")
      // (2) CREATE TABLE over an existing namespace (and vice versa) refuses
      s.sql(s"CREATE NAMESPACE $cat.gold")
      s.sql(s"CREATE TABLE $cat.gold.t (k BIGINT)")
      intercept[Exception] { s.sql(s"CREATE TABLE $cat.gold (k BIGINT)") }
      assert(s.sql(s"SHOW TABLES IN $cat.gold").count() == 1, "namespace survived")
      intercept[Exception] { s.sql(s"CREATE NAMESPACE $cat.race") }
      // (3) SHOW NAMESPACES IN a table is not-a-namespace, not store internals
      intercept[Exception] { s.sql(s"SHOW NAMESPACES IN $cat.race").collect() }
      // (4) property values with newlines/backslashes round-trip the marker
      s.sql(s"ALTER TABLE $cat.race SET TBLPROPERTIES ('note'='a\nb=c\\\\d')")
      val (_, props) = GraftCatalog.readMarker(root.resolve("race"))
      assert(props("note") == "a\nb=c\\d", s"marker mangled: ${props.get("note")}")
      // (5) metadata suffixes on a created-but-never-written table
      s.sql(s"CREATE TABLE $cat.fresh (k BIGINT)")
      assert(s.sql(s"SELECT * FROM $cat.fresh.files").count() == 0)
      assert(s.sql(s"SELECT * FROM $cat.fresh.snapshots").count() == 0)
    } finally rm(root)
  }

  test("concurrent UPDATEs: one commits, the loser fails loudly, state is never torn") {
    // Row-level rewrites claim OccSurgical(base): any base advance is a
    // conflict because the untouched carry was computed against that
    // exact base. Two racing UPDATEs must therefore serialize: exactly
    // one commits per race round, the loser surfaces the conflict (the
    // statement is re-runnable), and the surviving state is always one
    // of the two serial histories — never a blend.
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.cu (k BIGINT, v BIGINT)")
      s.sql(s"INSERT INTO $cat.cu SELECT id, 0 FROM range(0, 1000)")
      val store = root.resolve("cu")
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      def upd(add: Long): Thread = {
        val t = new Thread(() => {
          try s.sql(s"UPDATE $cat.cu SET v = v + $add WHERE k < 500")
          catch { case e: Throwable => errors.add(e) }
        })
        t.start(); t
      }
      val ts = Seq(upd(1), upd(10))
      ts.foreach(_.join())
      val commits = Snapshots.currentId(store).get - 1
      val winners = 2 - errors.size()
      assert(commits == winners,
        s"$winners statements claim success but $commits commits landed")
      assert(errors.size() < 2, "both updates failed — the race never serialized")
      // surviving state must be ONE of the serial histories (+1, +10, or
      // both landed if the race never overlapped) applied to exactly k<500
      val got = s.sql(s"SELECT sum(v) FROM $cat.cu").head.getLong(0)
      assert(Seq(1L, 10L, 11L).map(_ * 500).contains(got),
        s"torn state: sum(v)=$got is not a serial-history value")
      assert(s.sql(s"SELECT count(*) FROM $cat.cu").head.getLong(0) == 1000)
      assert(s.sql(s"SELECT count(*) FROM $cat.cu WHERE k >= 500 AND v <> 0")
        .head.getLong(0) == 0, "an update leaked outside its predicate")
    } finally rm(root)
  }

  test("row-level statements on an EMPTY table: UPDATE/DELETE no-op, MERGE inserts found it") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.e0 (k BIGINT, v BIGINT)")
      s.sql(s"UPDATE $cat.e0 SET v = 1 WHERE k = 1") // empty base: trivial no-op
      s.sql(s"DELETE FROM $cat.e0 WHERE k > 0")
      assert(Snapshots.currentId(root.resolve("e0")).isEmpty,
        "no-op statements on an empty table must not commit")
      s.sql(
        s"""MERGE INTO $cat.e0 t USING (SELECT id AS k, id * 2 AS v FROM range(0, 5)) s
           |ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET v = s.v
           |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
      assert(s.sql(s"SELECT count(*) FROM $cat.e0").head.getLong(0) == 5,
        "MERGE NOT MATCHED inserts must found an empty table")
    } finally rm(root)
  }

  test("metadata tables: t.snapshots / t.files / t.refs from pure SQL") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.mt (k BIGINT)")
      s.sql(s"INSERT INTO $cat.mt SELECT id FROM range(0, 30)")
      s.sql(s"INSERT INTO $cat.mt SELECT id FROM range(30, 40)")
      s.sql(s"DELETE FROM $cat.mt WHERE k < 5")
      Snapshots.createTag(root.resolve("mt"), "v2", 2)
      val snaps = s.sql(s"SELECT * FROM $cat.mt.snapshots ORDER BY snapshot_id").collect()
      assert(snaps.length == 3, s"expected 3 snapshots, got ${snaps.length}")
      val files = s.sql(s"SELECT count(*) FROM $cat.mt.files").head.getLong(0)
      assert(files == Snapshots.manifest(root.resolve("mt"), 3).size.toLong)
      val refs = s.sql(s"SELECT * FROM $cat.mt.refs").collect()
      assert(refs.exists(r => r.toSeq.contains("v2")), s"tag missing: ${refs.mkString}")
      // metadata relations are read-only and tiny; a data read still works
      assert(s.sql(s"SELECT count(*) FROM $cat.mt").head.getLong(0) == 35)
      intercept[Exception] { s.sql(s"SELECT * FROM $cat.mt.nope").collect() }
    } finally rm(root)
  }

  test("CALL procedures: compact, zorder, tags, rollback, expire, blooms from SQL") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.pt (k BIGINT, g BIGINT) TBLPROPERTIES ('statscol'='k')")
      s.range(0, 4000).select(col("id").as("k"), (col("id") % 50).as("g"))
        .repartitionByRange(8, col("k")).writeTo(s"$cat.pt").append()
      s.sql(s"INSERT INTO $cat.pt SELECT id, id % 50 FROM range(4000, 5000)")
      val store = root.resolve("pt")
      val before = Snapshots.manifest(store, 2).size
      // compact: fewer files, same rows, one committed snapshot returned
      val c = s.sql(s"CALL $cat.system.compact(tbl => 'pt', target_files => 2, " +
        "statscol => 'k')").head
      assert(c.getInt(0) == 3 && Snapshots.manifest(store, 3).size < before)
      assert(s.sql(s"SELECT count(*) FROM $cat.pt").head.getLong(0) == 5000)
      // tag + rollback + adopt choreography
      s.sql(s"CALL $cat.system.create_tag(tbl => 'pt', name => 'full', snapshot_id => 3)")
      assert(s.sql(s"SELECT count(*) FROM $cat.pt.refs").head.getLong(0) == 1)
      s.sql(s"DELETE FROM $cat.pt WHERE k < 1000")
      assert(s.sql(s"SELECT count(*) FROM $cat.pt").head.getLong(0) == 4000)
      val rb = s.sql(s"CALL $cat.system.rollback(tbl => 'pt', snapshot_id => 3)").head
      assert(rb.getInt(0) == 3)
      assert(s.sql(s"SELECT count(*) FROM $cat.pt").head.getLong(0) == 5000,
        "rollback must restore the pre-delete state")
      // z-order re-layout: still 5000 rows, zone maps carry both columns
      val z = s.sql(s"CALL $cat.system.zorder(tbl => 'pt', target_files => 4, " +
        "c1 => 'k', c2 => 'g')").head
      assert(z.getInt(0) > 3)
      assert(s.sql(s"SELECT count(*) FROM $cat.pt").head.getLong(0) == 5000)
      // blooms for point lookups; expire old history (tag pins snapshot 3)
      val b = s.sql(s"CALL $cat.system.build_blooms(tbl => 'pt', key_col => 'k')").head
      assert(b.getInt(0) > 0, "no bloom sidecars built")
      val ex = s.sql(s"CALL $cat.system.expire(tbl => 'pt', keep_from => ${z.getInt(0)})").head
      assert(ex.getInt(0) > 0, "expire reclaimed nothing")
      // the tag still reads whole after GC (refs pin history)
      assert(s.sql(s"SELECT count(*) FROM $cat.pt VERSION AS OF 'full'").head.getLong(0) == 5000)
      // unknown procedure refuses with the available list
      val e = intercept[Exception] {
        s.sql(s"CALL $cat.system.vacuum(tbl => 'pt')").collect()
      }
      assert(e.getMessage.contains("no procedure") || e.getMessage.contains("vacuum"))
    } finally rm(root)
  }

  test("statement odds and ends: TRUNCATE TABLE, SHOW TBLPROPERTIES, DESCRIBE") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.od (k BIGINT, v STRING) " +
        "TBLPROPERTIES ('statscol'='k', 'owner.team'='data')")
      s.sql(s"INSERT INTO $cat.od SELECT id, 'x' FROM range(0, 25)")
      // TRUNCATE routes through SupportsDelete.truncateTable (AlwaysTrue
      // delete): table empties, history stays time-travelable
      s.sql(s"TRUNCATE TABLE $cat.od")
      assert(s.sql(s"SELECT count(*) FROM $cat.od").head.getLong(0) == 0)
      assert(s.sql(s"SELECT count(*) FROM $cat.od VERSION AS OF 1").head.getLong(0) == 25)
      val props = s.sql(s"SHOW TBLPROPERTIES $cat.od").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("statscol").contains("k") && props.get("owner.team").contains("data"),
        s"properties missing: $props")
      val desc = s.sql(s"DESCRIBE TABLE $cat.od").collect().map(_.getString(0)).toSeq
      assert(desc.contains("k") && desc.contains("v"), s"DESCRIBE lost columns: $desc")
    } finally rm(root)
  }

  test("atomic CTAS / RTAS: marker-at-commit, no no-table window, abort leaves nothing") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.ct AS SELECT id AS k, id * 2 AS v FROM range(0, 100)")
      assert(s.sql(s"SELECT count(*) FROM $cat.ct").head.getLong(0) == 100)
      // RTAS: schema may change; history stays time-travelable
      s.sql(s"REPLACE TABLE $cat.ct AS SELECT id AS k FROM range(0, 7)")
      assert(s.sql(s"SELECT count(*) FROM $cat.ct").head.getLong(0) == 7)
      assert(s.sql(s"SELECT * FROM $cat.ct").columns.toSeq == Seq("k"))
      assert(s.sql(s"SELECT count(*) FROM $cat.ct VERSION AS OF 1").head.getLong(0) == 100,
        "RTAS must keep history time-travelable, not drop-and-recreate")
      // a failing CTAS must leave NO table and no husk directory
      intercept[Exception] {
        s.sql(s"CREATE TABLE $cat.boom AS " +
          "SELECT assert_true(id < 5, 'boom') AS a, id FROM range(0, 100000)")
      }
      assert(!s.sql(s"SHOW TABLES IN $cat").collect().map(_.getString(1)).contains("boom"),
        "failed CTAS left a table behind")
      assert(!Files.exists(root.resolve("boom")), "failed CTAS left a husk dir")
      // writeTo.createOrReplace goes through the same staged path
      s.range(0, 9).select(col("id").as("k")).writeTo(s"$cat.ct").createOrReplace()
      assert(s.sql(s"SELECT count(*) FROM $cat.ct").head.getLong(0) == 9)
    } finally rm(root)
  }

  test("second review round: CTAS races, rollback lock, statscol default, traversal guard") {
    val (cat, root) = freshCatalog()
    try {
      // (1) two racing CTAS of one name: exactly one table, holding exactly
      // ONE query's rows (never an OccAppend merge of both SELECTs)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val ts = Seq(7L, 1000L).map { base =>
        val t = new Thread(() => {
          try s.sql(s"CREATE TABLE $cat.race2 AS SELECT id + $base AS k FROM range(0, 50)")
          catch { case e: Throwable => errs.add(e) }
        })
        t.start(); t
      }
      ts.foreach(_.join())
      val n = s.sql(s"SELECT count(*) FROM $cat.race2").head.getLong(0)
      assert(n == 50, s"racing CTAS merged or lost rows: $n")
      assert(errs.size() == 1, s"expected exactly one loser, got ${errs.size()}")
      // (2) CALL compact WITHOUT statscol defaults to the table property —
      // rewritten files keep their zone maps
      s.sql(s"CREATE TABLE $cat.zc (k BIGINT) TBLPROPERTIES ('statscol'='k')")
      s.range(0, 2000).select(col("id").as("k")).repartitionByRange(4, col("k"))
        .writeTo(s"$cat.zc").append()
      s.sql(s"CALL $cat.system.compact(tbl => 'zc', target_files => 2)")
      assert(Snapshots.manifest(root.resolve("zc"), 2).forall(_.stats.isDefined),
        "compact without statscol arg stripped the table's zone maps")
      // (3) path traversal in a procedure's tbl argument refuses
      intercept[Exception] {
        s.sql(s"CALL $cat.system.expire(tbl => '../zc', keep_from => 1)").collect()
      }
      // (4) bad property keys fail at STAGE time, before any data commits
      intercept[Exception] {
        s.sql(s"CREATE TABLE $cat.badp TBLPROPERTIES ('a=b'='x') AS SELECT 1 AS k")
      }
      assert(!Files.exists(root.resolve("badp")), "failed staging left a husk")
    } finally rm(root)
  }

  test("parquet aggregate pushdown delegates through the catalog scan") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.ap (k BIGINT)")
      s.sql(s"INSERT INTO $cat.ap SELECT id FROM range(0, 1000)")
      val prev = s.conf.getOption("spark.sql.parquet.aggregatePushdown")
      s.conf.set("spark.sql.parquet.aggregatePushdown", "true")
      try {
        val q = s.sql(s"SELECT min(k) mn, max(k) mx, count(*) c FROM $cat.ap")
        val r = q.head
        assert(r.getLong(0) == 0 && r.getLong(1) == 999 && r.getLong(2) == 1000)
        // a footer-answered scan reads the AGGREGATE schema, not rows
        val scan = scanOf(q).scan.asInstanceOf[GraftScan].parquet
        assert(scan.readDataSchema.fieldNames.toSeq ==
          Seq("min(k)", "max(k)", "count(*)"),
          s"aggregation not pushed to parquet footers: ${scan.readDataSchema}")
      } finally {
        prev match {
          case Some(v) => s.conf.set("spark.sql.parquet.aggregatePushdown", v)
          case None => s.conf.unset("spark.sql.parquet.aggregatePushdown")
        }
      }
    } finally rm(root)
  }

  test("catalog writes and layer writes interleave on one store") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.mix (k BIGINT, v STRING)")
      s.sql(s"INSERT INTO $cat.mix SELECT id, 'sql' FROM range(0, 10)")
      val store = root.resolve("mix")
      // a layer-level append (publishOcc) lands as release 2; the
      // catalog sees it immediately — same store, same commit protocol
      val sq = s; import sq.implicits._
      Snapshots.publishOcc(s, store,
        (10L until 14L).map(i => (i, "occ")).toDF("k", "v"))
      assert(s.sql(s"SELECT count(*) FROM $cat.mix").head.getLong(0) == 14)
      assert(s.sql(s"SELECT count(*) FROM $cat.mix VERSION AS OF 1").head.getLong(0) == 10)
    } finally rm(root)
  }
}
