package graft.sources

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import graft.etl.Snapshots
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partitioned catalog tables (`PARTITIONED BY` → value-pure `_pv=`
  * layout): append, static overwrite, DYNAMIC overwrite replacing only
  * the partitions present (untouched partitions carried byte-identical),
  * partition pruning via the degenerate zone maps, DELETE re-staging
  * value-pure, and GC reclaiming replaced partitions after expire.
  */
class GraftPartitionedSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private var n = 0
  private def freshCatalog(): (String, Path) = {
    n += 1
    val cat = s"gpart$n"
    val root = Files.createTempDirectory(s"graft_part$n")
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, root)
  }

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  private def withDynamicMode[T](f: => T): T = {
    val prev = s.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try f finally s.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
  }

  test("dynamic INSERT OVERWRITE replaces only present partitions, carries the rest") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT, p BIGINT, v STRING) PARTITIONED BY (p)")
      s.sql(s"INSERT INTO $cat.t SELECT id, id % 4, concat('a', id) FROM range(0, 400)")
      val store = root.resolve("t")
      val base = Snapshots.manifest(store, 1)
      assert(base.forall(e => Snapshots.partValueOf(e.relPath).isDefined),
        "append must land value-pure files")
      withDynamicMode {
        s.sql(s"INSERT OVERWRITE $cat.t SELECT id, id % 4, 'NEW' FROM range(0, 50) " +
          "WHERE id % 4 IN (1, 3)")
      }
      val after = Snapshots.manifest(store, 2)
      // untouched partitions 0 and 2: every base entry carried byte-identical
      val untouchedBase = base.filter(e =>
        Set("0", "2")(Snapshots.partValueOf(e.relPath).get))
      untouchedBase.foreach(b => assert(after.exists(e =>
        e.relPath == b.relPath && e.md5 == b.md5 && e.seq == b.seq),
        s"untouched partition file ${b.relPath} was not carried verbatim"))
      // replaced partitions hold only the new rows
      assert(s.sql(s"SELECT count(*) FROM $cat.t WHERE p IN (1, 3)").head.getLong(0)
        == 25, "replaced partitions must hold exactly the overwrite's rows")
      assert(s.sql(s"SELECT count(*) FROM $cat.t WHERE p IN (0, 2)").head.getLong(0)
        == 200, "untouched partitions must keep their rows")
      assert(s.sql(s"SELECT count(*) FROM $cat.t WHERE v = 'NEW'").head.getLong(0) == 25)
      // time travel: pre-overwrite snapshot whole
      assert(s.sql(s"SELECT count(*) FROM $cat.t VERSION AS OF 1").head.getLong(0) == 400)
    } finally rm(root)
  }

  test("static INSERT OVERWRITE replaces the whole table, layout stays value-pure") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT, p BIGINT, v STRING) PARTITIONED BY (p)")
      s.sql(s"INSERT INTO $cat.t SELECT id, id % 4, 'x' FROM range(0, 100)")
      s.sql(s"INSERT OVERWRITE $cat.t SELECT id, id % 2, 'y' FROM range(0, 10)")
      val store = root.resolve("t")
      assert(s.sql(s"SELECT count(*) FROM $cat.t").head.getLong(0) == 10)
      val cur = Snapshots.manifest(store, Snapshots.currentId(store).get)
      assert(cur.forall(e => Snapshots.partValueOf(e.relPath).isDefined),
        "static overwrite must keep the value-pure layout")
      // and a dynamic overwrite still works after it
      withDynamicMode {
        s.sql(s"INSERT OVERWRITE $cat.t SELECT id, 0, 'z' FROM range(0, 3)")
      }
      assert(s.sql(s"SELECT count(*) FROM $cat.t WHERE p = 0").head.getLong(0) == 3)
      assert(s.sql(s"SELECT count(*) FROM $cat.t WHERE p = 1").head.getLong(0) == 5)
    } finally rm(root)
  }

  test("partition predicate prunes files at plan time via the degenerate zone maps") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT, p BIGINT, v STRING) PARTITIONED BY (p)")
      s.sql(s"INSERT INTO $cat.t SELECT id, id % 8, 'x' FROM range(0, 800)")
      val store = root.resolve("t")
      val entries = Snapshots.manifest(store, 1)
      assert(entries.forall(_.multi.exists(_._1 == "p")),
        "partitioned staging must land p zone maps")
      val q = s.sql(s"SELECT sum(k) FROM $cat.t WHERE p = 3")
      assert(q.head.getLong(0) == (0L until 800L).filter(_ % 8 == 3).sum)
      val opened = q.queryExecution.executedPlan.collectLeaves().collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.collect {
            case fp: org.apache.spark.sql.execution.datasources.FilePartition => fp
          }.flatMap(_.files).map(_.filePath.toString).distinct.size
      }
      // AQE may wrap; fall back to a recursive search
      val openedN = opened.getOrElse {
        def find(pl: org.apache.spark.sql.execution.SparkPlan): Option[Int] = pl match {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            Some(b.inputPartitions.collect {
              case fp: org.apache.spark.sql.execution.datasources.FilePartition => fp
            }.flatMap(_.files).map(_.filePath.toString).distinct.size)
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            find(a.executedPlan)
          case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => find(qs.plan)
          case other => other.children.view.flatMap(find(_)).headOption
        }
        find(q.queryExecution.executedPlan).getOrElse(fail("no scan found"))
      }
      assert(openedN < entries.size,
        s"partition predicate skipped nothing: $openedN of ${entries.size}")
    } finally rm(root)
  }

  test("DELETE re-stages value-pure; expire reclaims replaced partition files") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT, p BIGINT, v STRING) PARTITIONED BY (p)")
      s.sql(s"INSERT INTO $cat.t SELECT id, id % 4, 'x' FROM range(0, 400)")
      s.sql(s"DELETE FROM $cat.t WHERE k < 40")
      val store = root.resolve("t")
      assert(s.sql(s"SELECT count(*) FROM $cat.t").head.getLong(0) == 360)
      val cur = Snapshots.manifest(store, Snapshots.currentId(store).get)
      assert(cur.forall(e => Snapshots.partValueOf(e.relPath).isDefined),
        "DELETE must re-stage survivors value-pure")
      // dynamic overwrite of partition 1, then expire: the replaced
      // partition-1 files must be GONE from disk, carried files intact
      val beforeOw = Snapshots.manifest(store, Snapshots.currentId(store).get)
      val replaced = beforeOw.filter(e => Snapshots.partValueOf(e.relPath).contains("1"))
      withDynamicMode {
        s.sql(s"INSERT OVERWRITE $cat.t SELECT id, 1, 'w' FROM range(0, 5)")
      }
      s.sql(s"CALL $cat.system.expire('t', ${Snapshots.currentId(store).get})")
      replaced.foreach(e => assert(!Files.exists(store.resolve(e.relPath)),
        s"replaced partition file ${e.relPath} survived expire"))
      beforeOw.filterNot(e => Snapshots.partValueOf(e.relPath).contains("1"))
        .foreach(e => assert(Files.exists(store.resolve(e.relPath)),
          s"carried file ${e.relPath} was wrongly reclaimed"))
      assert(s.sql(s"SELECT count(*) FROM $cat.t WHERE p = 1").head.getLong(0) == 5)
    } finally rm(root)
  }

  test("partitioned CTAS stages value-pure; dynamic overwrite works on it") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t PARTITIONED BY (p) AS " +
        "SELECT id AS k, id % 4 AS p FROM range(0, 100)")
      val store = root.resolve("t")
      val m1 = Snapshots.manifest(store, 1)
      assert(m1.forall(e => Snapshots.partValueOf(e.relPath).isDefined),
        "CTAS must land value-pure files on a partitioned table")
      assert(s.sql(s"SELECT count(*) FROM $cat.t").head.getLong(0) == 100)
      withDynamicMode {
        s.sql(s"INSERT OVERWRITE $cat.t SELECT id, 2 FROM range(0, 7)")
      }
      assert(s.sql(s"SELECT count(*) FROM $cat.t WHERE p = 2").head.getLong(0) == 7)
      assert(s.sql(s"SELECT count(*) FROM $cat.t WHERE p != 2").head.getLong(0) == 75)
    } finally rm(root)
  }

  test("refusals: two partition columns, non-identity transform") {
    val (cat, root) = freshCatalog()
    try {
      intercept[Exception] {
        s.sql(s"CREATE TABLE $cat.bad1 (k BIGINT, p BIGINT, q BIGINT) PARTITIONED BY (p, q)")
      }
      // bucket(n, c) is SUPPORTED since r14c (GraftBucketedSpec);
      // transforms beyond identity/bucket still refuse
      intercept[Exception] {
        s.sql(s"CREATE TABLE $cat.bad2 (k BIGINT, ts TIMESTAMP) PARTITIONED BY (days(ts))")
      }
      // morkey + PARTITIONED BY composes since r14 (GraftMorPartSpec);
      // a morkey naming a non-column still refuses
      intercept[Exception] {
        s.sql(s"CREATE TABLE $cat.bad3 (k BIGINT NOT NULL, p BIGINT) PARTITIONED BY (p) " +
          "TBLPROPERTIES ('morkey'='nope')")
      }
      // row-level UPDATE works on partitioned tables and re-stages
      // its replacement groups value-pure
      s.sql(s"CREATE TABLE $cat.t (k BIGINT, p BIGINT) PARTITIONED BY (p)")
      s.sql(s"INSERT INTO $cat.t SELECT id, id % 2 FROM range(0, 10)")
      s.sql(s"UPDATE $cat.t SET k = k + 100 WHERE p = 0")
      assert(s.sql(s"SELECT sum(k) FROM $cat.t").head.getLong(0)
        == (0L until 10L).map(k => if (k % 2 == 0) k + 100 else k).sum)
      val store = root.resolve("t")
      val cur = Snapshots.manifest(store, Snapshots.currentId(store).get)
      assert(cur.forall(e => Snapshots.partValueOf(e.relPath).isDefined),
        "UPDATE must re-stage value-pure on a partitioned table")
    } finally rm(root)
  }

  test("DSv2 clustered write: ~one file per partition value, exact rendering") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (p STRING, v BIGINT) PARTITIONED BY (p)")
      // 16 input partitions x 4 values: an unclustered partitionBy would
      // land up to 64 files; the engine-clustered write lands ~4
      s.range(0, 40000).repartition(16)
        .select(concat(lit("g="), col("id") % 4).as("p"), col("id").as("v"))
        .writeTo(s"$cat.t").append()
      val entries = graft.etl.Snapshots.manifest(root.resolve("t"), 1)
      assert(entries.size <= 8,
        s"clustered write should land ~one file per value, got ${entries.size}")
      // pvOfPath DECODES the escaped dir names back to the raw values
      val pvs = entries.flatMap(e => GraftScan.pvOfPath(e.relPath)).toSet
      assert(pvs == Set("g=0", "g=1", "g=2", "g=3"), pvs.toString)
      // and the ON-DISK rendering matches Spark's partitionBy escaping
      // ('=' is in the hive-escape set: %3D)
      assert(entries.forall(_.relPath.contains("_pv=g%3D")),
        entries.map(_.relPath).mkString(","))
      assert(s.sql(s"SELECT count(*) FROM $cat.t WHERE p = 'g=2'")
        .head.getLong(0) == 10000L)
      // nulls and empty strings collapse to the default dir, stay exact
      s.sql(s"INSERT INTO $cat.t VALUES (NULL, -1), ('', -2)")
      assert(s.sql(s"SELECT count(*) FROM $cat.t WHERE p IS NULL").head.getLong(0) == 1)
      assert(s.sql(s"SELECT v FROM $cat.t WHERE p = ''").head.getLong(0) == -2)
      // dynamic overwrite through the DIRECT writer: replace one value,
      // carry the rest byte-identical — no scratch, no restaging
      val pre = graft.etl.Snapshots.manifest(root.resolve("t"),
        graft.etl.Snapshots.currentId(root.resolve("t")).get)
      val pk = "spark.sql.sources.partitionOverwriteMode"
      val prior = s.conf.get(pk)
      s.conf.set(pk, "dynamic")
      try s.sql(s"INSERT OVERWRITE $cat.t SELECT 'g=1', id FROM range(0, 5)")
      finally s.conf.set(pk, prior)
      val post = graft.etl.Snapshots.manifest(root.resolve("t"),
        graft.etl.Snapshots.currentId(root.resolve("t")).get)
      pre.filter(e => !GraftScan.pvOfPath(e.relPath).contains("g=1"))
        .foreach(b => assert(post.exists(e =>
          e.relPath == b.relPath && e.md5 == b.md5 && e.seq == b.seq),
          s"dynamic overwrite touched untouched partition file ${b.relPath}"))
      assert(s.sql(s"SELECT count(*) FROM $cat.t WHERE p = 'g=1'")
        .head.getLong(0) == 5L)
      assert(s.sql(s"SELECT count(*) FROM $cat.t").head.getLong(0)
        == 30000L + 2L + 5L)
    } finally rm(root)
  }

  test("'writedistribution'='none' opts out of the clustered write") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (p BIGINT, v BIGINT) PARTITIONED BY (p) " +
        "TBLPROPERTIES ('writedistribution'='none')")
      // a skew-shaped insert: 16 input partitions, one dominant value —
      // the V1 path keeps per-task write parallelism (up to 16 files
      // for the hot value instead of 1)
      s.range(0, 40000).repartition(16)
        .select((col("id") % 2).as("p"), col("id").as("v"))
        .writeTo(s"$cat.t").append()
      val entries = graft.etl.Snapshots.manifest(root.resolve("t"), 1)
      assert(entries.size > 4,
        s"opt-out should keep per-task parallel files, got ${entries.size}")
      assert(entries.forall(e =>
        graft.etl.Snapshots.partValueOf(e.relPath).isDefined))
      assert(s.sql(s"SELECT count(*) FROM $cat.t WHERE p = 1").head.getLong(0)
        == 20000L)
    } finally rm(root)
  }
}
