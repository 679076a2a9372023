package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {

  test("salted join returns exactly the plain join result under heavy skew") {
    val s = TestSpark.spark
    import s.implicits._
    // 10k rows of one hot key + a tail, joined to a small dim
    val big = ((1 to 10000).map(_ => 1) ++ (1 to 100).map(i => i % 7 + 2))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("key", "payload")
    val small = (1 to 8).map(k => (k, s"dim_$k")).toDF("key", "name")
    val plain = big.join(small, Seq("key")).groupBy("key").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(big, small, "key").groupBy("key").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("heavyHitters surfaces the hot key first") {
    val s = TestSpark.spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val df = ((1 to 500).map(_ => "hot") ++ Seq("a", "b", "c")).toDF("k")
    val top = Skew.heavyHitters(df, col("k"), 2).collect()
    assert(top.head.getString(0) == "hot" && top.head.getLong(1) == 500L)
  }
}
