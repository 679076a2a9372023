package graft
import org.apache.spark.sql.functions._
object DebugUpd {
  def main(args: Array[String]): Unit = {
    val s = GraftSession("debug-upd", "8")
    val d = "/root/testdata/sf0.1"
    val root = java.nio.file.Files.createTempDirectory("dbgu")
    s.conf.set("spark.sql.catalog.dc", classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.dc.root", root.toString)
    s.sql("CREATE TABLE dc.orders (o_orderkey BIGINT, o_orderstatus STRING, cents BIGINT) " +
      "TBLPROPERTIES ('statscol'='o_orderkey')")
    val src = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    src.repartitionByRange(8, col("o_orderkey")).writeTo("dc.orders").append()
    println("BEFORE manifest:")
    graft.etl.Snapshots.manifest(root.resolve("orders"), 1).foreach(e =>
      println(s"  ${e.relPath} stats=${e.stats} seq=${e.seq}"))
    s.sql("UPDATE dc.orders SET cents = cents * 2, o_orderstatus = 'U' " +
      "WHERE o_orderkey BETWEEN 800 AND 1599 AND o_orderstatus = 'O'")
    println("AFTER manifest:")
    graft.etl.Snapshots.manifest(root.resolve("orders"), 2).foreach(e =>
      println(s"  ${e.relPath} stats=${e.stats} seq=${e.seq}"))
    val expect = src.withColumn("o_orderstatus",
        when(col("o_orderkey").between(800, 1599) && col("o_orderstatus") === "O", lit("U"))
          .otherwise(col("o_orderstatus")))
      .withColumn("cents",
        when(col("o_orderkey").between(800, 1599) && col("o_orderstatus") === "U", col("cents") * 2)
          .otherwise(col("cents")))
    // note: careful — recompute properly
    val expect2 = src.select(col("o_orderkey"),
      when(col("o_orderkey").between(800, 1599) && col("o_orderstatus") === "O", lit("U"))
        .otherwise(col("o_orderstatus")).as("o_orderstatus"),
      when(col("o_orderkey").between(800, 1599) && col("o_orderstatus") === "O", col("cents") * 2)
        .otherwise(col("cents")).as("cents"))
    val got = s.sql("SELECT * FROM dc.orders")
    val missing = expect2.exceptAll(got)
    val extra = got.exceptAll(expect2)
    println(s"missing=${missing.count()} extra=${extra.count()}")
    missing.orderBy("o_orderkey").show(60, false)
    extra.orderBy("o_orderkey").show(20, false)
    s.stop()
  }
}
