package graft.sources

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 scan's three scale capabilities: reported statistics (a
  * small catalog table auto-broadcasts in joins), runtime V2 filtering
  * (dynamic-pruning IN-sets from a join's build side prune manifest
  * FILES at execution time), and key-grouped output (two tables
  * `PARTITIONED BY` the same column join with ZERO shuffle when
  * `spark.sql.sources.v2.bucketing.enabled` is on — the
  * storage-partitioned join).
  */
class GraftScanFeaturesSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private var n = 0
  private def freshCatalog(): (String, Path) = {
    n += 1
    val cat = s"gscan$n"
    val root = Files.createTempDirectory(s"graft_gscan$n")
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, root)
  }

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  /** Collect through AQE stages — executed plans hide children inside
    * QueryStageExec/AdaptiveSparkPlanExec wrappers.
    */
  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val here = pf.lift(p).toSeq
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case other                    => other.children
    }
    here ++ kids.flatMap(collectAll(_)(pf))
  }

  private def executedAll[T](df: DataFrame)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
    collectAll(df.queryExecution.executedPlan)(pf)

  test("reported statistics: a small catalog table broadcasts in a join") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.dim (k BIGINT, name STRING)")
      s.range(0, 50).select(col("id").as("k"),
        concat(lit("n"), col("id")).as("name")).writeTo(s"$cat.dim").append()
      val fact = s.range(0, 200000).select((col("id") % 50).as("k"),
        col("id").as("v"))
      val joined = fact.join(s.table(s"$cat.dim"), "k")
        .groupBy("name").agg(sum("v").as("sv"))
      val out = joined.collect()
      assert(out.length == 50)
      val bhj = executedAll(joined) { case b: BroadcastHashJoinExec => b }
      assert(bhj.nonEmpty,
        s"small catalog table did not broadcast:\n${joined.queryExecution.executedPlan}")
    } finally rm(root)
  }

  test("runtime V2 filtering: join build-side keys prune manifest files") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.fact (pk BIGINT, v BIGINT) PARTITIONED BY (pk) " +
        "TBLPROPERTIES ('statscol'='v')")
      // 8 partition values, one-plus files each
      s.range(0, 80000).select((col("id") % 8).as("pk"), col("id").as("v"))
        .repartition(8, col("pk")).writeTo(s"$cat.fact").append()
      val dimPath = Files.createTempDirectory("gscan_dim")
      s.range(0, 8).select(col("id").as("k"), (col("id") % 4).as("grp"))
        .write.mode("overwrite").parquet(dimPath.toString)
      val dim = s.read.parquet(dimPath.toString).filter(col("grp") === 0) // keeps k ∈ {0, 4}
      GraftScan.resetRuntimePrune(root.resolve("fact"))
      val joined = s.table(s"$cat.fact").join(dim, col("pk") === col("k"))
        .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      val row = joined.collect().head
      assert(row.getLong(0) == 20000L)
      val expectedSv = (0L until 80000L).filter(i => i % 8 == 0 || i % 8 == 4).sum
      assert(row.getLong(1) == expectedSv)
      val (kept, total) = GraftScan.lastRuntimePruneFor(root.resolve("fact"))
      assert(total > 0, "runtime filter was never invoked (no DPP on the scan)")
      assert(kept < total, s"runtime filter pruned nothing: kept $kept of $total")
      rm(dimPath)
    } finally rm(root)
  }

  test("storage-partitioned join: same-keyed tables join with zero shuffle") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.a (pk BIGINT, v BIGINT) PARTITIONED BY (pk)")
      s.sql(s"CREATE TABLE $cat.b (pk BIGINT, w BIGINT) PARTITIONED BY (pk)")
      s.range(0, 10000).select((col("id") % 8).as("pk"), col("id").as("v"))
        .writeTo(s"$cat.a").append()
      s.range(0, 4000).select((col("id") % 8).as("pk"), (col("id") * 2).as("w"))
        .writeTo(s"$cat.b").append()
      val prev = s.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      // a shuffle-free join must not broadcast either side, or the test
      // proves nothing — force the SPJ path by disabling auto-broadcast
      val prevBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = s.table(s"$cat.a").join(s.table(s"$cat.b"), "pk")
          .groupBy("pk").agg(sum(col("v") + col("w")).as("svw"))
        val out = joined.collect()
        assert(out.length == 8)
        // correctness against a plain recompute
        val expect = s.range(0, 10000).select((col("id") % 8).as("pk"), col("id").as("v"))
          .join(s.range(0, 4000).select((col("id") % 8).as("pk"), (col("id") * 2).as("w")), "pk")
          .groupBy("pk").agg(sum(col("v") + col("w")).as("svw"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(out.map(r => r.getLong(0) -> r.getLong(1)).toMap == expect)
        val shuffles = executedAll(joined) { case e: ShuffleExchangeLike => e }
        // the final groupBy is ON the partition key, so even the agg
        // re-uses the key-grouped distribution: the whole plan is
        // exchange-free
        assert(shuffles.isEmpty,
          s"expected zero shuffles:\n${joined.queryExecution.executedPlan}")
      } finally {
        prev match {
          case Some(v) => s.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
          case None    => s.conf.unset("spark.sql.sources.v2.bucketing.enabled")
        }
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      }
    } finally rm(root)
  }

  test("STRING identity partitions: SPJ joins shuffle-free, DPP prunes by path") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.a (region STRING, v BIGINT) PARTITIONED BY (region)")
      s.sql(s"CREATE TABLE $cat.b (region STRING, w BIGINT) PARTITIONED BY (region)")
      // a space and a colon exercise the partition-path escaping round-trip
      val regions = Seq("emea", "apac", "north america", "x:y")
      val df = s.range(0, 8000).select(
        element_at(lit(regions.toArray), (col("id") % 4 + 1).cast("int")).as("region"),
        col("id").as("v"))
      df.writeTo(s"$cat.a").append()
      df.select(col("region"), (col("v") * 2).as("w")).writeTo(s"$cat.b").append()
      val prevSpj = s.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
      val prevBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val agg = s.table(s"$cat.a").join(s.table(s"$cat.b"), "region")
          .groupBy("region").agg(count(lit(1)).as("n"))
        val rows = agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(rows.keySet == regions.toSet)
        assert(rows.values.forall(_ == 2000L * 2000L))
        val sh = executedAll(agg) {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        }
        assert(sh.isEmpty, s"string-partitioned SPJ shuffled:\n${agg.queryExecution.executedPlan}")
      } finally {
        prevSpj match {
          case Some(v) => s.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
          case None    => s.conf.unset("spark.sql.sources.v2.bucketing.enabled")
        }
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      }
      // DPP: a selective dim join prunes string partitions by exact path
      val dimPath = Files.createTempDirectory("gscan_sdim")
      s.createDataFrame(regions.map(Tuple1(_))).toDF("dr")
        .withColumn("keep", (col("dr") === "x:y").cast("int"))
        .write.mode("overwrite").parquet(dimPath.toString)
      GraftScan.resetRuntimePrune(root.resolve("a"))
      val dpp = s.table(s"$cat.a")
        .join(s.read.parquet(dimPath.toString).filter(col("keep") === 1),
          col("region") === col("dr"))
        .agg(count(lit(1)).as("n"))
      assert(dpp.collect().head.getLong(0) == 2000L)
      val (kept, total) = GraftScan.lastRuntimePruneFor(root.resolve("a"))
      assert(total > 0 && kept < total,
        s"string partition runtime prune failed: kept $kept of $total")
      rm(dimPath)
    } finally rm(root)
  }

  test("bloom sidecars answer runtime filters when zones cannot") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT)")
      // random distribution: every file's k range covers ~everything, so
      // only the BLOOM sidecars can skip files for point keys
      s.range(0, 80000).select(col("id").as("k"), col("id").as("v"))
        .repartition(8).writeTo(s"$cat.t").append()
      s.sql(s"CALL $cat.system.build_blooms('t', 'k')")
      val dimPath = Files.createTempDirectory("gscan_bdim")
      s.range(0, 80000).select(col("id").as("dk"))
        .write.mode("overwrite").parquet(dimPath.toString)
      GraftScan.resetRuntimePrune(root.resolve("t"))
      val joined = s.table(s"$cat.t")
        .join(s.read.parquet(dimPath.toString).filter(col("dk").isin(42L, 77042L)),
          col("k") === col("dk"))
        .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      val row = joined.collect().head
      assert(row.getLong(0) == 2L && row.getLong(1) == 42L + 77042L)
      val (kept, total) = GraftScan.lastRuntimePruneFor(root.resolve("t"))
      assert(total == 8, s"expected 8 files, saw $total")
      assert(kept < total,
        s"bloom-backed runtime filter pruned nothing: kept $kept of $total")
      rm(dimPath)
    } finally rm(root)
  }

  test("null partition values: key-grouped output declines, reads stay exact") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.a (p STRING, v BIGINT) PARTITIONED BY (p)")
      s.sql(s"CREATE TABLE $cat.b (p STRING, w BIGINT) PARTITIONED BY (p)")
      val withNulls = s.range(0, 3000).select(
        when(col("id") % 3 === 0, lit(null)).otherwise(
          concat(lit("g"), col("id") % 3)).as("p"),
        col("id").as("v"))
      withNulls.writeTo(s"$cat.a").append()
      withNulls.select(col("p"), (col("v") * 2).as("w")).writeTo(s"$cat.b").append()
      val prevSpj = s.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      try {
        // a __HIVE_DEFAULT_PARTITION__ dir cannot render its key row —
        // the scan must DECLINE the grouping claim (a null-keyed group
        // under join alignment would be a correctness trap), and answers
        // must stay exact through the ordinary shuffle join
        assert(s.table(s"$cat.a").count() == 3000L)
        assert(s.table(s"$cat.a").filter(col("p").isNull).count() == 1000L)
        val got = s.table(s"$cat.a").join(s.table(s"$cat.b"), "p")
          .groupBy("p").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        // inner join on p drops the null-partition rows (SQL semantics);
        // each surviving group self-crosses 1000 x 1000
        assert(got == Map("g1" -> 1000000L, "g2" -> 1000000L), s"got $got")
      } finally {
        prevSpj match {
          case Some(v) => s.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
          case None    => s.conf.unset("spark.sql.sources.v2.bucketing.enabled")
        }
      }
    } finally rm(root)
  }

  test("pvOfPath parses and unescapes value-pure segments") {
    assert(GraftScan.pvOfPath("data/occ-x/_pv=42/part-0.parquet").contains("42"))
    assert(GraftScan.pvOfPath("data/occ-x/_pv=a%20b/part-0.parquet").contains("a b"))
    assert(GraftScan.pvOfPath("data/occ-x/part-0.parquet").isEmpty)
    assert(GraftScan.unescapePath("x%3Ay") == "x:y")
    assert(GraftScan.unescapePath("plain") == "plain")
  }

  test("empty-string partition values survive runtime pruning") {
    // Spark's partitionBy renders BOTH null and "" as
    // __HIVE_DEFAULT_PARTITION__. A runtime IN-set containing "" DOES
    // equi-join-match ""-valued rows, so pruning the default dir on an
    // exact-path mismatch silently drops them — the segment is
    // ambiguous and must be treated as unjudgeable (kept).
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.a (p STRING, v BIGINT) PARTITIONED BY (p)")
      s.createDataFrame(Seq(("", 1L), ("", 2L), ("x", 10L), ("y", 100L)))
        .toDF("p", "v").writeTo(s"$cat.a").append()
      val dimPath = Files.createTempDirectory("gscan_edim")
      s.createDataFrame(Seq(("", 1), ("x", 1), ("y", 0)))
        .toDF("dp", "keep")
        .write.mode("overwrite").parquet(dimPath.toString)
      GraftScan.resetRuntimePrune(root.resolve("a"))
      val joined = s.table(s"$cat.a")
        .join(s.read.parquet(dimPath.toString).filter(col("keep") === 1),
          col("p") === col("dp"))
        .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      val row = joined.collect().head
      assert(row.getLong(0) == 3L && row.getLong(1) == 13L,
        s"empty-string partition rows were pruned: n=${row.getLong(0)} sv=${row.getLong(1)}")
      val (kept, total) = GraftScan.lastRuntimePruneFor(root.resolve("a"))
      // the 'y' dir still prunes; the ambiguous default dir is kept
      assert(total > 0 && kept < total,
        s"the unambiguous 'y' dir should still prune: kept $kept of $total")
      rm(dimPath)
    } finally rm(root)
  }
}
