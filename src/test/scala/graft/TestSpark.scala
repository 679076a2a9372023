package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all specs (Spark startup is ~5s; specs
  * share it to keep `sbt test` fast).
  */
object TestSpark {
  lazy val spark: SparkSession = GraftSession("graft-test", "4")
  val sf: String = "/root/testdata/sf0.001"
}
