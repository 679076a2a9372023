package graft
import org.apache.spark.sql.functions._
object PosDebug {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("pos-debug")
    val root = java.nio.file.Files.createTempDirectory("posdbg")
    spark.conf.set("spark.sql.catalog.pd", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pd.root", root.toString)
    spark.sql("CREATE TABLE pd.t (v BIGINT, s STRING) TBLPROPERTIES ('mordelete'='position', 'statscol'='v')")
    spark.sql("INSERT INTO pd.t SELECT id % 100, concat('s', id % 7) FROM range(0, 1000)")
    spark.sql("DELETE FROM pd.t WHERE v = 5")
    val store = root.resolve("t")
    val m = graft.etl.Snapshots.manifest(store, graft.etl.Snapshots.currentId(store).get)
    println("manifest relPaths:")
    m.foreach(e => println("  " + e.relPath + " seq=" + e.seq))
    val pos = m.filter(graft.etl.Snapshots.isPosDelete)
    if (pos.nonEmpty) {
      val pairs = spark.read.parquet(pos.map(e => store.resolve(e.relPath).toString): _*)
      println("pair schema: " + pairs.schema.catalogString)
      pairs.show(5, false)
      println("prefix=" + new org.apache.hadoop.fs.Path(store.toUri).toString + "/")
    } else println("NO POSITION TOMBSTONE STAGED")
    println("count=" + spark.sql("SELECT count(*) FROM pd.t").head.getLong(0))
    spark.stop()
  }
}
