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

  /** E2b query: ORC and CSV round-trip fidelity — the two interchange
    * formats a warehouse meets beyond JSONL/parquet. Each format writes
    * the corpus and reads it back; fidelity is counted, not assumed: the
    * read-back joins the source on doc_id and any row whose (text, lang,
    * source, n_chars) changed — md5-compared on text — counts as a
    * mismatch. CSV is the adversarial one (quotes, embedded separators,
    * newlines), so it is written quoted+escaped and read multiLine; ORC
    * is Spark-native columnar. The oracle pins zero mismatches and the
    * full row count per format — a lost or altered row under either
    * format breaks the hash gate.
    *
    * Shape at 100 TB: write and read are both format-parallel full
    * scans; the fidelity join is a hash join on doc_id (the read-back
    * side arrives pre-partitioned by file split, the join shuffles
    * once). This is an audit query, run per export, not per batch.
    */
  def formatsQuery(s: SparkSession, d: String): DataFrame = {
    val src = graft.Tables.documents(s, d)
      .select(col("doc_id"), md5(col("text")).as("h"), col("lang"),
        col("source"), col("n_chars"))
    def fidelity(fmt: String, back: DataFrame): DataFrame = {
      val b = back.select(col("doc_id"), md5(col("text")).as("bh"),
        col("lang").as("bl"), col("source").as("bs"), col("n_chars").as("bn"))
      src.join(b, Seq("doc_id"), "full_outer")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("bh").isNull || col("h").isNull ||
            col("bh") =!= col("h") || col("bl") =!= col("lang") ||
            col("bs") =!= col("source") || col("bn") =!= col("n_chars"), 1L)
            .otherwise(0L)).as("n_mismatch"))
        .select(lit(fmt).as("format"), col("n_rows"), col("n_mismatch"))
    }
    val orcOut = graft.etl.SessionPaths.scratch(s, "corpus_io/orc")
    graft.Tables.documents(s, d).write.mode("overwrite").orc(orcOut)
    val csvOut = graft.etl.SessionPaths.scratch(s, "corpus_io/csv")
    graft.Tables.documents(s, d).write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true")
      .option("escape", "\"").csv(csvOut)
    val orcBack = s.read.orc(orcOut)
    val csvBack = s.read.schema(documentSchema)
      .option("header", "true").option("multiLine", "true")
      .option("escape", "\"").csv(csvOut)
    fidelity("csv", csvBack).unionByName(fidelity("orc", orcBack))
      .orderBy("format")
  }

  val formatsOracleSql: String = """
    SELECT 'csv' AS format, CAST(count(*) AS BIGINT) AS n_rows,
      CAST(0 AS BIGINT) AS n_mismatch FROM documents
    UNION ALL
    SELECT 'orc', CAST(count(*) AS BIGINT), CAST(0 AS BIGINT) FROM documents
    ORDER BY format"""

  /** E2c: schema-evolution audit. A long-lived corpus accretes schema
    * versions — an early crawl batch lacks columns later batches carry.
    * The layout answer is additive evolution under partitioned parquet:
    * each batch writes its own schema under `batch=<v>`, readers merge
    * (`mergeSchema`) and old batches surface the new columns as NULL —
    * no rewrite of petabytes of v1 files, no reader break. The audit
    * proves three things per batch, counted not assumed: row counts
    * survived, the v1 batch's missing columns are ALL null (and v2's are
    * none), and the text payload itself round-tripped bit-exactly
    * (order-independent bit_xor of md5 prefixes — the E17 technique).
    *
    * Shape at 100 TB: the merged read is an ordinary partitioned scan
    * (schema merge is a footer-only planning step when
    * `mergeSchema=true`); the audit is one batch-keyed map-side-combined
    * aggregate.
    */
  def schemaEvolution(s: SparkSession, d: String): DataFrame = {
    val docs = graft.Tables.documents(s, d)
    val base = graft.etl.SessionPaths.scratch(s, "schema_evo")
    docs.filter(col("doc_id") % 2 === 0)
      .select("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$base/batch=v1")
    docs.filter(col("doc_id") % 2 === 1)
      .write.mode("overwrite").parquet(s"$base/batch=v2")
    s.read.option("mergeSchema", "true").parquet(base)
      .groupBy(col("batch").cast("string").as("batch"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("source").isNull.cast("long")).as("n_null_source"),
        sum(col("n_chars").isNull.cast("long")).as("n_null_chars"),
        expr("bit_xor(CAST(conv(substring(md5(text), 1, 12), 16, 10) AS BIGINT))")
          .as("text_xor"))
      .orderBy("batch")
  }

  val schemaEvolutionOracleSql: String = """
    SELECT 'v1' AS batch, count(*) AS n_rows, count(*) AS n_null_source,
      count(*) AS n_null_chars,
      bit_xor(CAST(('0x' || substr(md5(text), 1, 12)) AS BIGINT)) AS text_xor
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT 'v2', count(*), 0, 0,
      bit_xor(CAST(('0x' || substr(md5(text), 1, 12)) AS BIGINT))
    FROM documents WHERE doc_id % 2 = 1
    ORDER BY batch"""
}
