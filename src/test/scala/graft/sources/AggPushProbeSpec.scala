package graft.sources

import java.nio.file.Files

import graft.TestSpark
import graft.etl.Snapshots
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

class AggPushProbeSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("probe: builder accepts a CountStar aggregation when the conf is on") {
    val root = Files.createTempDirectory("aggprobe")
    try {
      Snapshots.publish(s, root,
        s.range(0, 100).select(col("id").as("k"), col("id").as("v")))
      val entries = Snapshots.manifest(root, 1)
      val schema = s.read.parquet(root.resolve(entries.head.relPath).toString).schema
      s.conf.set("spark.sql.parquet.aggregatePushdown", "true")
      try {
        val b = new GraftScanBuilder(s, root, 1, entries, schema, None,
          CaseInsensitiveStringMap.empty())
        import org.apache.spark.sql.connector.expressions.aggregate._
        val agg = new Aggregation(Array(new CountStar()),
          Array.empty[org.apache.spark.sql.connector.expressions.Expression])
        val ok = b.pushAggregation(agg)
        info(s"builder pushAggregation(CountStar) = $ok")
        assert(ok, "builder refused CountStar with the conf on")
      } finally s.conf.unset("spark.sql.parquet.aggregatePushdown")
    } finally {
      import scala.collection.JavaConverters._
      val walk = Files.walk(root)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally walk.close()
    }
  }
}
