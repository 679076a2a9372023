package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus interchange I/O for the LLM-data operators: JSONL (one JSON
  * document per line, the de-facto training-corpus format) and plain
  * text-per-line, both gzip-friendly.
  *
  * Schema is always supplied explicitly: schema inference on JSONL is a
  * full extra pass over 100 TB. Malformed lines are kept (PERMISSIVE)
  * with the raw line in `_corrupt_record` so a cleanup filter can count
  * and quarantine them rather than failing the job.
  */
object CorpusIO {

  val documentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** text + from_json rather than the native json reader: the native
    * reader's `_corrupt_record` column may not be queried on its own
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), which makes
    * "count my bad lines" — the first thing an ingest job does — awkward.
    * Parsing per line with from_json has no such restriction and the same
    * distributed shape.
    */
  def readJsonl(s: SparkSession, path: String,
                schema: StructType = documentSchema): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", StringType)
    val opts = Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record")
    s.read.text(path)
      .select(from_json(col("value"), withCorrupt, opts).as("j"))
      .select(col("j.*"))
  }

  /** Valid rows only; quarantined lines are `readJsonl` rows where
    * `_corrupt_record` is not null.
    */
  def readJsonlClean(s: SparkSession, path: String,
                     schema: StructType = documentSchema): DataFrame =
    readJsonl(s, path, schema)
      .filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")

  def writeJsonl(df: DataFrame, path: String, gzip: Boolean = true): Unit = {
    val w = df.write.mode("overwrite")
    (if (gzip) w.option("compression", "gzip") else w).json(path)
  }

  /** One document per line of plain text: doc_id from a stable hash of
    * (file, line) is NOT reproducible across reorderings, so the id is
    * the xxhash64 of the content itself — dedup-friendly and
    * partition-order independent.
    */
  def readTextLines(s: SparkSession, path: String): DataFrame =
    s.read.text(path)
      .filter(length(col("value")) > 0)
      .select(xxhash64(col("value")).as("doc_id"), col("value").as("text"))

  /** E2 query (r5, oracle-checked): full JSONL round-trip — documents →
    * gzip JSONL → read back PERMISSIVE alongside three deliberately
    * malformed lines. Clean rows must round-trip bit-exact (doc_id,
    * md5(text), n_chars); the malformed lines must land in quarantine,
    * surfaced as one summary row (doc_id −1) so the count sits under the
    * oracle too.
    */
  def query(s: SparkSession, d: String): DataFrame = {
    val sq = s; import sq.implicits._
    // per-application scratch: two concurrent sessions must never race on
    // the same output directory (VERDICT r6 #8)
    val out = graft.etl.SessionPaths.scratch(s, "corpus_io/docs")
    writeJsonl(graft.Tables.documents(s, d), out, gzip = true)
    Seq("{oops, not json", "[1, 2, 3]", "plain text line")
      .toDF("value").coalesce(1).write.mode("append").text(out)
    val back = readJsonl(s, out)
    val clean = back.filter(col("_corrupt_record").isNull)
      .select(col("doc_id"), md5(col("text")).as("text_md5"), col("n_chars"))
    val quarantined = back.filter(col("_corrupt_record").isNotNull)
      .agg(count(lit(1)).as("n"))
      .select(lit(-1L).as("doc_id"), lit("QUARANTINED").as("text_md5"), col("n").as("n_chars"))
    clean.unionByName(quarantined).orderBy("doc_id")
  }
}
