package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic FK-consistent upscaler: `sfN × factor` built as `factor`
  * key-shifted replicas of every fact/entity table (dims `region`/
  * `nation` copy once — their 5/25-key domains are referenced by value).
  * Every key column shifts by `replica * 100_000_000`, applied to BOTH
  * sides of each FK (orders.o_custkey ↔ customer.c_custkey,
  * lineitem.{l_orderkey,l_partkey,l_suppkey} ↔ their parents,
  * events.user_id ↔ c_custkey, doc/vec ids), so joins land exactly as at
  * the source scale and per-key group sizes stay constant while global
  * volume grows ×factor. Payload columns (dates, prices, text,
  * embeddings) are copied verbatim: document texts repeat across
  * replicas BY DESIGN — at sf1 every doc has 10 exact copies, a heavier
  * dedup regime than the source corpus, which is the interesting
  * direction for the operators under test.
  *
  * Purpose (VERDICT r11 item 5): a self-run CORRECTNESS sweep at 10× the
  * driver's largest gate — `Verify` + `tools/check.py` against the same
  * DuckDB oracles on the generated dir. Correctness above sf0.1 had
  * only ever been inferred, not checked; q_smallqty's r11 shape bug is
  * the proof such sweeps find real defects.
  */
object UpscaleTestdata {

  private val OFF = 100000000L

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/root/repo/scratch/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val s = GraftSession("graft-upscale")
    try upscale(s, src, dst, factor) finally s.stop()
  }

  def upscale(s: SparkSession, src: String, dst: String, factor: Int): Unit = {
    def shifted(table: String, keyCols: Seq[String]): DataFrame = {
      val base = s.read.parquet(s"$src/$table.parquet")
      val reps = s.range(factor).select(col("id").as("__r"))
      val out = base.crossJoin(broadcast(reps))
      keyCols.foldLeft(out)((df, k) =>
        df.withColumn(k, col(k) + col("__r") * OFF)).drop("__r")
    }
    def copy(table: String): DataFrame = s.read.parquet(s"$src/$table.parquet")

    val plan: Seq[(String, DataFrame)] = Seq(
      "region"     -> copy("region"),
      "nation"     -> copy("nation"),
      "customer"   -> shifted("customer", Seq("c_custkey")),
      "supplier"   -> shifted("supplier", Seq("s_suppkey")),
      "part"       -> shifted("part", Seq("p_partkey")),
      "orders"     -> shifted("orders", Seq("o_orderkey", "o_custkey")),
      "lineitem"   -> shifted("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey")),
      "events"     -> shifted("events", Seq("event_id", "user_id")),
      "documents"  -> shifted("documents", Seq("doc_id")),
      "embeddings" -> shifted("embeddings", Seq("vec_id")))
    plan.foreach { case (t, df) =>
      // single-FILE layout, matching the driver's testdata (check.py's
      // DuckDB views read `<dir>/<table>.parquet` as one file): write the
      // one-part directory, then hoist the part file out
      val tmp = s"$dst/.tmp_$t"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file for $t"))
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dst/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      new java.io.File(tmp).listFiles().foreach(_.delete())
      new java.io.File(tmp).delete()
      println(s"[upscale] $t: ${s.read.parquet(s"$dst/$t.parquet").count()} rows")
    }
  }
}
