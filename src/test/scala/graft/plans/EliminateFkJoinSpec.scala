package graft.plans

import graft.{Tables, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EliminateFkJoinSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val d = TestSpark.sf

  private def withRule[A](f: => A): A = {
    s.conf.set("spark.graft.fkJoinElimination.enabled", "true")
    FkRegistry.declare("orders", "l_orderkey", "o_orderkey")
    try f
    finally {
      s.conf.set("spark.graft.fkJoinElimination.enabled", "false")
      FkRegistry.clear()
    }
  }

  private def joined(o: DataFrame): DataFrame =
    Tables.lineitem(s, d)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_quantity")

  private def hasJoin(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.nonEmpty

  test("verified FK join to a bare dim is eliminated, results unchanged") {
    val orders = Tables.orders(s, d).select("o_orderkey")
    val without = joined(orders).orderBy("l_orderkey", "l_quantity").collect()
    val (eliminated, rows) = withRule {
      val df = joined(orders)
      (!hasJoin(df), df.orderBy("l_orderkey", "l_quantity").collect())
    }
    assert(eliminated, "join should be eliminated under the declared FK")
    assert(rows.toSeq == without.toSeq)
  }

  test("bails out when a dim column is consumed") {
    withRule {
      val df = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "o_totalprice")
      assert(hasJoin(df))
    }
  }

  test("bails out on an undeclared pair") {
    withRule {
      val df = Tables.lineitem(s, d)
        .join(Tables.part(s, d).select("p_partkey"), col("l_partkey") === col("p_partkey"))
        .select("l_orderkey", "l_quantity")
      assert(hasJoin(df))
    }
  }

  test("bails out when the dim is filtered — the join is selective there") {
    withRule {
      val filtered = Tables.orders(s, d)
        .filter(col("o_totalprice") > 100000).select("o_orderkey")
      val df = joined(filtered)
      assert(hasJoin(df))
      // and the results really differ from the unfiltered fact side —
      // the bailout is semantic, not cosmetic
      assert(df.count() < Tables.lineitem(s, d).count())
    }
  }

  test("bails out when the dim pk is an alias, not the scanned catalog column") {
    withRule {
      // computed expression aliased to the declared PK name: passes the
      // name check, but the "pk" is not the verified unique column — the
      // rewrite would silently duplicate/drop fact rows. Must keep the join.
      val computed = Tables.orders(s, d)
        .select((col("o_custkey") % 100).as("o_orderkey"))
      assert(hasJoin(joined(computed)), "computed-alias dim must not eliminate")
      // a bare rename of a DIFFERENT column to the PK name is just as unsound
      val renamed = Tables.orders(s, d)
        .select(col("o_custkey").as("o_orderkey"))
      assert(hasJoin(joined(renamed)), "renamed-column dim must not eliminate")
      // while a passthrough projection of the real PK still eliminates
      assert(!hasJoin(joined(Tables.orders(s, d).select("o_orderkey"))))
    }
  }

  test("declaration binds to TABLE identity: a same-named column on another table never eliminates") {
    // A decoy table whose LEAF genuinely scans a column named o_orderkey
    // (not an alias — it survives tracing to the leaf) but which is NOT
    // the audited orders table: its keys are non-unique, so eliminating
    // the join would change row counts. The registry is declared for
    // table `orders`; only the real orders scan may fire.
    val tmp = java.nio.file.Files.createTempDirectory("fk_decoy").resolve("decoy.parquet")
    Tables.orders(s, d).select(col("o_custkey").as("o_orderkey"))
      .write.mode("overwrite").parquet(tmp.toString)
    try withRule {
      val decoy = s.read.parquet(tmp.toString)
      assert(hasJoin(joined(decoy)),
        "join to a same-named column on an undeclared table must survive")
      // sanity: the identical shape against the DECLARED table eliminates
      assert(!hasJoin(joined(Tables.orders(s, d).select("o_orderkey"))))
      // and declaring the decoy's own identity licenses it there too —
      // identity comes from the leaf scan, not the column name
      FkRegistry.declare("decoy", "l_orderkey", "o_orderkey")
      assert(!hasJoin(joined(s.read.parquet(tmp.toString))))
    } finally {
      import scala.jdk.CollectionConverters._
      val root = tmp.getParent
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("aggregate directly over the join (BI rollup shape) is eliminated, results unchanged") {
    // groupBy straight off the join: CollapseProject folds the select list
    // into the Aggregate, so the optimized plan is Aggregate(Join) with no
    // intervening Project — the shape the Project-only matcher used to miss
    def rollup(): DataFrame = Tables.lineitem(s, d)
      .join(Tables.orders(s, d).select("o_orderkey"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum("l_quantity").as("qty"), count(lit(1)).as("n"))
    val without = rollup().orderBy("l_returnflag").collect()
    val (eliminated, rows) = withRule {
      val df = rollup()
      (!hasJoin(df), df.orderBy("l_returnflag").collect())
    }
    assert(eliminated, "Aggregate(Join) should eliminate under the declared FK")
    assert(rows.toSeq == without.toSeq)
  }

  test("aggregate bails out when grouping key or agg input is a dim column") {
    withRule {
      val base = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      // dim column as grouping key
      assert(hasJoin(base.groupBy(col("o_orderstatus")).agg(sum("l_quantity"))))
      // dim column as aggregate input
      assert(hasJoin(base.groupBy(col("l_returnflag")).agg(sum("o_totalprice"))))
    }
  }

  test("aggregate bails out when the dim is filtered") {
    withRule {
      val filtered = Tables.orders(s, d)
        .filter(col("o_totalprice") > 100000).select("o_orderkey")
      val df = Tables.lineitem(s, d)
        .join(filtered, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(sum("l_quantity"))
      assert(hasJoin(df))
    }
  }

  test("LEFT join to a declared-unique dim is eliminated on uniqueness alone") {
    // uniqueness is all a left join needs — declare ONLY that (no FK
    // pair): the left join eliminates, the inner join must NOT
    s.conf.set("spark.graft.fkJoinElimination.enabled", "true")
    FkRegistry.declareUnique("orders", "o_orderkey")
    try {
      val dim = Tables.orders(s, d).select("o_orderkey")
      def leftJoined(o: DataFrame): DataFrame = Tables.lineitem(s, d)
        .join(o, col("l_orderkey") === col("o_orderkey"), "left")
        .select("l_orderkey", "l_quantity")
      val without = leftJoined(dim).orderBy("l_orderkey", "l_quantity").collect()
      val df = leftJoined(dim)
      assert(!hasJoin(df), "left join should eliminate under declared uniqueness")
      assert(df.orderBy("l_orderkey", "l_quantity").collect().toSeq == without.toSeq)
      // inner needs totality too — uniqueness alone must keep the join
      assert(hasJoin(joined(dim)), "inner join must not eliminate on uniqueness alone")
      // a FILTERED dim is fine for the left join: the fact multiset is
      // preserved either way and nobody reads the match. Equality is
      // against the REAL left join to the filtered dim.
      val filtered = Tables.orders(s, d)
        .filter(col("o_totalprice") > 100000).select("o_orderkey")
      val fdf = leftJoined(filtered)
      assert(!hasJoin(fdf), "left join to a filtered unique dim should eliminate")
      assert(fdf.orderBy("l_orderkey", "l_quantity").collect().toSeq == without.toSeq)
      // consuming a dim column still bails (the null-extension is read)
      val consuming = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"), "left")
        .select("l_orderkey", "o_totalprice")
      assert(hasJoin(consuming), "dim-consuming left join must keep the join")
    } finally {
      s.conf.set("spark.graft.fkJoinElimination.enabled", "false")
      FkRegistry.clear()
    }
  }

  test("the registered q_fk_elim / q_fk_elim_left queries really eliminate their joins") {
    // the oracle gate proves result soundness either way — THIS pins that
    // the rewrite actually fired in the shipped queries' scoped sessions
    def joins(df: DataFrame): Int = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.size
    try {
      assert(joins(graft.relational.Relational.qFkElim(s, d)) == 0,
        "q_fk_elim kept its join")
      assert(joins(graft.relational.Relational.qFkElimLeft(s, d)) == 0,
        "q_fk_elim_left kept its join")
    } finally FkRegistry.clear()
  }

  test("rule is inert while the conf gate is off") {
    FkRegistry.declare("orders", "l_orderkey", "o_orderkey")
    try assert(hasJoin(joined(Tables.orders(s, d).select("o_orderkey"))))
    finally FkRegistry.clear()
  }
}
