package graft.sources

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import graft.etl.Snapshots
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DATE partition columns: ISO `_pv=` rendering with an exact
  * round-trip, key-grouped planning and runtime pruning — and the
  * declines that keep the claims honest (timestamps are
  * session-timezone-rendered; null dates land the unjudgeable default
  * dir).
  */
class GraftDatePartitionSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private var n = 0
  private def freshCatalog(): (String, Path) = {
    n += 1
    val cat = s"gdate$n"
    val root = Files.createTempDirectory(s"graft_gdate$n")
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, root)
  }

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  private def countShuffles(p: SparkPlan): Int = {
    val kids = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    (p match {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => 1
      case _ => 0
    }) + kids.map(countShuffles).sum
  }

  private def withSpj[A](f: => A): A = {
    val prevSpj = s.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val prevBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f
    finally {
      prevSpj match {
        case Some(v) => s.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None    => s.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("date partitions land ISO _pv= dirs and SPJ-join exchange-free") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.a (od DATE, v BIGINT) PARTITIONED BY (od)")
      s.sql(s"CREATE TABLE $cat.b (od DATE, w BIGINT) PARTITIONED BY (od)")
      s.sql(s"INSERT INTO $cat.a SELECT date_add(DATE'2024-01-01', " +
        "CAST(id % 4 AS INT) * 30), id FROM range(0, 1000)")
      s.sql(s"INSERT INTO $cat.b SELECT date_add(DATE'2024-01-01', " +
        "CAST(id % 4 AS INT) * 30), id * 2 FROM range(0, 1000)")
      // the path rendering is the ISO local date
      val pvs = Snapshots.manifest(root.resolve("a"), 1)
        .flatMap(e => GraftScan.pvOfPath(e.relPath)).toSet
      assert(pvs == Set("2024-01-01", "2024-01-31", "2024-03-01", "2024-03-31"),
        s"unexpected date renderings: $pvs")
      withSpj {
        val joined = s.table(s"$cat.a").join(s.table(s"$cat.b"), "od")
          .groupBy("od").agg(count(lit(1)).as("n"))
        val got = joined.collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
        assert(countShuffles(joined.queryExecution.executedPlan) == 0,
          "date SPJ should run exchange-free")
        assert(got.keySet == pvs && got.values.forall(_ == 250L * 250L))
      }
    } finally rm(root)
  }

  test("runtime IN-set prunes date partitions (round-trip exact)") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.f (od DATE, v BIGINT) PARTITIONED BY (od)")
      s.sql(s"INSERT INTO $cat.f SELECT date_add(DATE'2024-01-01', " +
        "CAST(id % 8 AS INT)), id FROM range(0, 1000)")
      val total = Snapshots.manifest(root.resolve("f"), 1).size
      // the build side must be a real source relation with a filter —
      // runtime filtering does not target literal LocalRelations
      val dimDir = Files.createTempDirectory("gdate_dim")
      s.sql("SELECT date_add(DATE'2024-01-01', CAST(id AS INT)) AS dd, id " +
        "FROM range(0, 8)").write.mode("overwrite").parquet(dimDir.toString)
      val dim = s.read.parquet(dimDir.toString).filter(col("id").isin(2, 4))
        .select("dd")
      GraftScan.resetRuntimePrune(root.resolve("f"))
      val joined = s.table(s"$cat.f").join(dim, col("od") === col("dd"))
      val cnt = joined.count()
      val (kept, ttl) = GraftScan.lastRuntimePruneFor(root.resolve("f"))
      assert(ttl == total && kept < total,
        s"date runtime prune did not fire: kept $kept of $ttl (total $total)")
      assert(cnt == 250L, "pruning changed the answer")
    } finally rm(root)
  }

  test("timestamp partitions: UTC epoch-micros _pv=, SPJ exchange-free, TZ-proof") {
    val (cat, root) = freshCatalog()
    val prevTz = s.conf.get("spark.sql.session.timeZone")
    try {
      s.sql(s"CREATE TABLE $cat.t (ts TIMESTAMP, v BIGINT) PARTITIONED BY (ts)")
      s.sql(s"CREATE TABLE $cat.u (ts TIMESTAMP, w BIGINT) PARTITIONED BY (ts)")
      s.sql(s"INSERT INTO $cat.t SELECT timestamp_seconds(1700000000 + (id % 3) " +
        "* 86400), id FROM range(0, 300)")
      // the second side written under a DIFFERENT session timezone: the
      // micros rendering must agree anyway (that is its whole point)
      s.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
      s.sql(s"INSERT INTO $cat.u SELECT timestamp_seconds(1700000000 + (id % 3) " +
        "* 86400), id FROM range(0, 300)")
      val pvs = Snapshots.manifest(root.resolve("t"), 1)
        .flatMap(e => GraftScan.pvOfPath(e.relPath)).toSet
      assert(pvs == Set("1700000000000000", "1700086400000000",
        "1700172800000000"), s"unexpected timestamp renderings: $pvs")
      assert(pvs == Snapshots.manifest(root.resolve("u"), 1)
        .flatMap(e => GraftScan.pvOfPath(e.relPath)).toSet,
        "the two sessions' timezones leaked into the path rendering")
      withSpj {
        val joined = s.table(s"$cat.t").join(s.table(s"$cat.u"), "ts")
          .groupBy("ts").agg(count(lit(1)).as("n"))
        assert(countShuffles(joined.queryExecution.executedPlan) == 0,
          "timestamp-partitioned join was not storage-partitioned:\n" +
            joined.queryExecution.executedPlan)
        assert(joined.collect().map(_.getLong(1)).sum == 3L * 100L * 100L)
      }
      // runtime pruning through a dim join's IN-set, same as dates (a
      // REAL parquet dim with a selective filter — the planner declines
      // to plant runtime filters from literal relations)
      val dimDir = root.resolve("ts_dim")
      s.sql("SELECT timestamp_seconds(1700000000 + id * 86400) AS dd, " +
        "id AS tag FROM range(0, 3)")
        .write.mode("overwrite").parquet(dimDir.toString)
      val dim = s.read.parquet(dimDir.toString).filter(col("tag") === 1)
      GraftScan.resetRuntimePrune(root.resolve("t"))
      val cnt = s.table(s"$cat.t").join(dim, col("ts") === col("dd")).count()
      assert(cnt == 100L)
      val (kept, total) = GraftScan.lastRuntimePruneFor(root.resolve("t"))
      assert(total > 0 && kept < total,
        s"timestamp runtime filter pruned nothing: kept $kept of $total")
    } finally {
      s.conf.set("spark.sql.session.timeZone", prevTz)
      rm(root)
    }
  }

  test("timestamp partitions compose with morkey DML and dynamic overwrite") {
    val (cat, root) = freshCatalog()
    val prevOw = s.conf.get("spark.sql.sources.partitionOverwriteMode")
    try {
      s.sql(s"CREATE TABLE $cat.m (ts TIMESTAMP, k BIGINT NOT NULL, v BIGINT) " +
        "PARTITIONED BY (ts) TBLPROPERTIES ('morkey'='k')")
      s.sql(s"INSERT INTO $cat.m SELECT timestamp_seconds(1700000000 + " +
        "(id % 3) * 86400), id, id * 10 FROM range(0, 300)")
      // MoR UPDATE: the delta re-stages through stageOccPartitioned,
      // whose timestamp rendering must agree with the clustered writer's
      s.sql(s"UPDATE $cat.m SET v = -1 WHERE k < 30")
      assert(s.sql(s"SELECT count(*) FROM $cat.m WHERE v = -1").head.getLong(0) == 30)
      assert(s.sql(s"SELECT count(*) FROM $cat.m").head.getLong(0) == 300)
      val pvs = Snapshots.manifest(root.resolve("m"),
        Snapshots.currentId(root.resolve("m")).get)
        .filterNot(Snapshots.isDelete)
        .flatMap(e => GraftScan.pvOfPath(e.relPath))
      assert(pvs.nonEmpty && pvs.forall(_.forall(_.isDigit)),
        s"MoR delta landed a non-micros timestamp rendering: ${pvs.distinct}")
      // dynamic overwrite replaces exactly the micros-named partition
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      s.sql(s"INSERT OVERWRITE $cat.m SELECT timestamp_seconds(1700086400), " +
        "id + 10000, CAST(7 AS BIGINT) FROM range(0, 50)")
      assert(s.sql(s"SELECT count(*) FROM $cat.m WHERE v = 7").head.getLong(0) == 50)
      assert(s.sql(s"SELECT count(*) FROM $cat.m").head.getLong(0) == 250,
        "dynamic overwrite replaced the wrong timestamp partition(s)")
      assert(s.sql(s"SELECT count(*) FROM $cat.m WHERE v = -1").head.getLong(0) == 20)
    } finally {
      s.conf.set("spark.sql.sources.partitionOverwriteMode", prevOw)
      rm(root)
    }
  }

  test("null dates land the default dir: grouped claims decline, reads exact") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.f (od DATE, v BIGINT) PARTITIONED BY (od)")
      s.sql(s"INSERT INTO $cat.f SELECT CASE WHEN id % 10 = 0 THEN NULL " +
        "ELSE date_add(DATE'2024-01-01', CAST(id % 4 AS INT)) END, id " +
        "FROM range(0, 1000)")
      withSpj {
        val self = s.table(s"$cat.f")
        val joined = self.as("x").join(self.as("y"), Seq("od"))
          .groupBy("od").agg(count(lit(1)).as("n"))
        assert(countShuffles(joined.queryExecution.executedPlan) > 0,
          "a null-date partition dir must decline key-grouped claims")
        // null keys never equi-join; the non-null groups stay exact
        // (nulls fall on id%10==0, which only hits residues 0 and 2:
        // groups are 200, 250, 200, 250)
        assert(joined.collect().map(_.getLong(1)).sum ==
          200L * 200L + 250L * 250L + 200L * 200L + 250L * 250L)
      }
      // and an equi-join against a date still answers exactly (the
      // default dir is unjudgeable and conservatively kept)
      val dim = s.sql("SELECT DATE'2024-01-02' AS dd")
      val cnt = s.table(s"$cat.f").join(dim, col("od") === col("dd")).count()
      assert(cnt == 250L)
    } finally rm(root)
  }
}
