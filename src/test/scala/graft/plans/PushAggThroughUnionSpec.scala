package graft.plans

import graft.TestSpark
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Union}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Global algebraic aggregates push through Union as per-leg
  * pre-aggregates (each fusing with its scan), merged by a trivial
  * outer aggregate — and the rewrite declines everything it cannot
  * prove exact.
  */
class PushAggThroughUnionSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  import s.implicits._

  private def unionDf = {
    val a = s.range(0, 1000).select(col("id").as("k"), (col("id") % 7).as("v"))
    val b = s.range(1000, 1500).select(col("id").as("k"), (col("id") % 5).as("v"))
    val c = s.range(0, 0).select(col("id").as("k"), col("id").as("v")) // empty leg
    a.union(b).union(c)
  }

  private def pushed(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case Aggregate(Nil, _, u: Union, _)
          if u.children.forall(_.isInstanceOf[Aggregate]) => true
    }.isDefined

  test("sum/count/min/max over a union pre-aggregate per leg, answers exact") {
    val df = unionDf.agg(
      sum("v").as("sv"), count(lit(1)).as("n"), min("k").as("mn"),
      max("k").as("mx"), (sum("v") + count(lit(1))).as("mixed"))
    assert(pushed(df), df.queryExecution.optimizedPlan.toString)
    val r = df.head
    val expV = (0L until 1000).map(_ % 7).sum + (1000L until 1500).map(_ % 5).sum
    assert(r.getLong(0) == expV && r.getLong(1) == 1500 && r.getLong(2) == 0 &&
      r.getLong(3) == 1499 && r.getLong(4) == expV + 1500, r.toString)
  }

  test("count over an ALL-EMPTY union still returns 0") {
    val e1 = s.range(0).select(col("id").as("k"))
    val e2 = s.range(0).select(col("id").as("k"))
    val df = e1.union(e2).agg(count(lit(1)).as("n"), sum("k").as("sk"))
    assert(pushed(df))
    val r = df.head
    assert(r.getLong(0) == 0 && r.isNullAt(1), r.toString)
  }

  test("decimal sums keep their exact type through the two-level merge") {
    val a = s.range(0, 100).select(col("id").cast("decimal(10,2)").as("m"))
    val b = s.range(100, 200).select(col("id").cast("decimal(10,2)").as("m"))
    val df = a.union(b).agg(sum("m").as("sm"))
    assert(pushed(df))
    assert(df.schema("sm").dataType.simpleString == "decimal(20,2)")
    assert(df.head.getDecimal(0).longValueExact() == (0L until 200).sum)
  }

  test("declines: grouped aggs, avg, distinct counts, single-leg unions") {
    val grouped = unionDf.groupBy("v").agg(sum("k"))
    assert(!pushed(grouped))
    val avgQ = unionDf.agg(avg("v"))
    assert(!pushed(avgQ))
    val dist = unionDf.agg(countDistinct("v"))
    assert(!pushed(dist))
    // correctness of the declined forms is untouched
    assert(avgQ.head.getDouble(0) > 0)
    assert(dist.head.getLong(0) == 7)
  }

  test("merged MoR read: the spliced union's aggregate fuses per leg") {
    val cat = "pau" + System.nanoTime()
    val root = java.nio.file.Files.createTempDirectory("graft_pau")
    s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    try {
      s.sql(s"CREATE TABLE $cat.kv (k BIGINT NOT NULL, v BIGINT) " +
        "TBLPROPERTIES ('morkey'='k', 'statscol'='k')")
      s.sql(s"INSERT INTO $cat.kv SELECT id, id % 100 FROM range(0, 10000)")
      s.sql(s"UPDATE $cat.kv SET v = v + 1000 WHERE k BETWEEN 10 AND 19")
      val df = s.sql(s"SELECT sum(v) AS sv, count(*) AS n FROM $cat.kv")
      assert(pushed(df), df.queryExecution.optimizedPlan.toString)
      val r = df.head
      assert(r.getLong(1) == 10000)
      assert(r.getLong(0) == (0L until 10000).map(_ % 100).sum + 10 * 1000)
    } finally {
      import scala.collection.JavaConverters._
      val walk = java.nio.file.Files.walk(root)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }
}
