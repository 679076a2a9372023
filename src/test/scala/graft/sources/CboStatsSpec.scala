package graft.sources

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.TestSpark
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Column-level statistics → Spark CBO: the scan reports exact footer
  * row counts, manifest zone min/max, footer null counts and
  * `CALL system.analyze` NDVs through `Statistics.columnStats()`, and
  * Spark's own `transformV2Stats` turns them into catalyst
  * ColumnStats. With `spark.sql.cbo.enabled`, a selective filter on an
  * analyzed column shrinks the estimated join side below the broadcast
  * threshold — the plan flip a bytes-only estimate can never make.
  */
class CboStatsSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private var n = 0
  private def freshCatalog(): (String, Path) = {
    n += 1
    val cat = s"gcbo$n"
    val root = Files.createTempDirectory(s"graft_gcbo$n")
    s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, root)
  }

  private def rm(root: Path): Unit = {
    val walk = Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
    pf.lift(p).toSeq ++ p.children.flatMap(collectAll(_)(pf))

  test("reported stats reach catalyst: exact rowCount + attribute stats") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL, v BIGINT NOT NULL) " +
        "TBLPROPERTIES ('statscol'='k')")
      s.range(0, 5000).select(col("id").as("k"), (col("id") % 7).as("v"))
        .writeTo(s"$cat.t").append()
      s.sql(s"CALL $cat.system.analyze('t', 'k,v')").collect()
      val prev = s.conf.getOption("spark.sql.cbo.enabled")
      try {
        s.conf.set("spark.sql.cbo.enabled", "true")
        val df = s.table(s"$cat.t")
        val rel = df.queryExecution.optimizedPlan
        val st = rel.stats
        assert(st.rowCount.contains(BigInt(5000)), s"rowCount: ${st.rowCount}")
        val byName = st.attributeStats.toSeq.map { case (a, cs) => a.name -> cs }.toMap
        assert(byName.contains("k") && byName.contains("v"),
          s"attribute stats missing: ${byName.keys}")
        assert(byName("k").distinctCount.contains(BigInt(5000)))
        assert(byName("v").distinctCount.contains(BigInt(7)))
        assert(byName("k").min.contains(0L) && byName("k").max.contains(4999L))
        assert(byName("k").nullCount.contains(BigInt(0)))
      } finally prev match {
        case Some(v) => s.conf.set("spark.sql.cbo.enabled", v)
        case None    => s.conf.unset("spark.sql.cbo.enabled")
      }
    } finally rm(root)
  }

  test("string columns analyze avg/max byte lengths; served to catalyst") {
    val (cat, root) = freshCatalog()
    try {
      s.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL, txt STRING)")
      // lengths 1..10 uniformly, plus nulls: avg = ceil(5.5) = 6, max = 10
      s.range(0, 1000).select(col("id").as("k"),
        when(col("id") % 100 === 0, lit(null).cast("string"))
          .otherwise(substring(lit("abcdefghij"), lit(1),
            (col("id") % 10 + 1).cast("int"))).as("txt"))
        .writeTo(s"$cat.t").append()
      s.sql(s"CALL $cat.system.analyze('t', 'txt')").collect()
      val prev = s.conf.getOption("spark.sql.cbo.enabled")
      try {
        s.conf.set("spark.sql.cbo.enabled", "true")
        val st = s.table(s"$cat.t").queryExecution.optimizedPlan.stats
        val txt = st.attributeStats.toSeq.collectFirst {
          case (a, cs) if a.name == "txt" => cs }.get
        assert(txt.nullCount.contains(BigInt(10)), s"nulls: ${txt.nullCount}")
        assert(txt.maxLen.contains(10L), s"maxLen: ${txt.maxLen}")
        assert(txt.avgLen.exists(l => l >= 5L && l <= 7L), s"avgLen: ${txt.avgLen}")
        assert(txt.distinctCount.contains(BigInt(10)), // the 10 prefixes
          s"ndv: ${txt.distinctCount}")
      } finally prev match {
        case Some(v) => s.conf.set("spark.sql.cbo.enabled", v)
        case None    => s.conf.unset("spark.sql.cbo.enabled")
      }
    } finally rm(root)
  }

  test("CBO broadcast flip: analyzed NDV shrinks a filtered join side") {
    val (cat, root) = freshCatalog()
    val prevCbo = s.conf.getOption("spark.sql.cbo.enabled")
    val prevBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.sql(s"CREATE TABLE $cat.dim (k BIGINT NOT NULL, cents BIGINT NOT NULL) " +
        "TBLPROPERTIES ('statscol'='cents')")
      s.range(0, 40000).select(col("id").as("k"), (col("id") * 3).as("cents"))
        .writeTo(s"$cat.dim").append()
      s.sql(s"CREATE TABLE $cat.fact (k BIGINT NOT NULL, qty BIGINT NOT NULL)")
      s.range(0, 200000).select((col("id") % 40000).as("k"), lit(2L).as("qty"))
        .writeTo(s"$cat.fact").append()
      s.sql(s"CALL $cat.system.analyze('dim', 'k,cents')").collect()
      // dim parquet is well above this threshold; only a stats-shrunk
      // estimate can broadcast it
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "32768")
      def q() = s.table(s"$cat.fact")
        .join(s.table(s"$cat.dim").filter(col("cents") === 300L), "k")
        .agg(count(lit(1)).as("n"), sum("qty").as("sq"))
      s.conf.set("spark.sql.cbo.enabled", "false")
      val off = q()
      val offRow = off.collect().head
      // initial (pre-AQE) plan: size-only estimate keeps the sort-merge
      val smj = collectAll(off.queryExecution.sparkPlan) {
        case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty,
        s"baseline unexpectedly broadcast:\n${off.queryExecution.sparkPlan}")
      s.conf.set("spark.sql.cbo.enabled", "true")
      val on = q()
      val onRow = on.collect().head
      val bhj = collectAll(on.queryExecution.sparkPlan) {
        case j: BroadcastHashJoinExec => j }
      assert(bhj.nonEmpty,
        s"CBO stats did not flip the join:\n${on.queryExecution.sparkPlan}")
      assert(offRow == onRow, s"plans disagree: $offRow vs $onRow")
      assert(onRow.getLong(0) == 5L && onRow.getLong(1) == 10L)
    } finally {
      prevCbo match {
        case Some(v) => s.conf.set("spark.sql.cbo.enabled", v)
        case None    => s.conf.unset("spark.sql.cbo.enabled")
      }
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      rm(root)
    }
  }
}
