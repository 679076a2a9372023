package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** E1: end-to-end training-corpus curation — the composition a real
  * LLM-data pipeline runs: exact dedup (keep-min representative) →
  * token-count bounds → stopword-quality floor, in ONE pass over the
  * corpus (single shuffle on the content hash; every predicate is a
  * column expression so the whole filter chain stays in codegen).
  */
object Curate {

  def query(s: SparkSession, d: String): DataFrame = {
    val byHash = Window.partitionBy("h")
    val w = split(lower(col("text")), " ")
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("text"),
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("h"))
      .withColumn("keeper", min("doc_id").over(byHash))
      .filter(col("keeper") === col("doc_id"))
      .withColumn("n_tok", size(w))
      .withColumn("n_stop",
        size(filter(w, t => TextAnalysis.stopwords("en").map(x => t === x).reduce(_ || _))))
      .filter(col("n_tok").between(20, 500) && col("n_stop") >= 1)
      .select(col("doc_id"), col("lang"), col("n_tok"), col("n_stop"))
      .orderBy("doc_id")
  }

  /** E3: deterministic stratified sampling — the corpus-mixing primitive
    * (downsample the dominant language, keep low-resource ones whole).
    * Selection is a pure hash of the doc id (md5 prefix → bucket in
    * [0,1000)), so the sample is reproducible across runs, partitionings
    * and engines — `rand()`-based sampling is none of those.
    */
  val sampleRateX1000: Map[String, Int] = Map("en" -> 200) // others: keep all

  def sampleStratified(s: SparkSession, d: String): DataFrame = {
    val bucket = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 1000).as("bucket")
    val rate = sampleRateX1000.foldLeft(lit(1000)) { case (acc, (lang, r)) =>
      when(col("lang") === lang, lit(r)).otherwise(acc)
    }
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), bucket)
      .filter(col("bucket") < rate)
      .orderBy("doc_id")
  }

  val sampleOracleSql: String = """
    SELECT doc_id, lang, bucket FROM (
      SELECT doc_id, lang,
        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS bucket
      FROM documents) t
    WHERE bucket < (CASE WHEN lang = 'en' THEN 200 ELSE 1000 END)
    ORDER BY doc_id"""

  /** E4: corpus vocabulary top-k — explode tokens, count occurrences and
    * document frequency, keep the 100 heaviest. The classic heavy-shuffle
    * op: explode multiplies rows ~90×, but map-side partial aggregation
    * collapses them back to distinct-tokens-per-partition before the
    * shuffle, so the wire carries the vocabulary, not the corpus.
    */
  def vocabTopk(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n").desc, col("tok"))
      .limit(100)

  /** E5: sequence packing — concatenate-and-chunk docs into fixed
    * token-budget training sequences (GPT-style). Docs are spread over
    * deterministic buckets (at scale: one bucket per output shard), ordered
    * by doc_id within bucket, and assigned seq_id = exclusive-prefix-sum of
    * token counts DIV budget. One window pass; no driver-side loop.
    */
  val PackBudget = 512
  val PackBuckets = 8

  def packSequences(s: SparkSession, d: String): DataFrame = {
    val byBucket = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select(col("doc_id"), (col("doc_id") % PackBuckets).as("bucket"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("cum_before", coalesce(sum("n_tok").over(byBucket), lit(0L)))
      .select(col("doc_id"), col("bucket"), col("n_tok"),
        expr(s"cum_before DIV $PackBudget").as("seq_id"),
        expr(s"cum_before % $PackBudget").as("seq_off"))
      .orderBy("doc_id")
  }

  val vocabOracleSql: String = """
    SELECT tok, count(*) AS n, count(DISTINCT doc_id) AS n_docs
    FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents) t
    GROUP BY tok ORDER BY n DESC, tok LIMIT 100"""

  val packOracleSql: String = """
    SELECT doc_id, bucket, n_tok,
      CAST(cum_before // 512 AS BIGINT) AS seq_id,
      CAST(cum_before % 512 AS BIGINT) AS seq_off FROM (
      SELECT doc_id, doc_id % 8 AS bucket,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        coalesce(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
          PARTITION BY doc_id % 8 ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM documents) t
    ORDER BY doc_id"""

  val oracleSql: String = """
    WITH base AS (
      SELECT doc_id, lang, text,
        md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h
      FROM documents),
    keep AS (
      SELECT doc_id, lang, text,
        min(doc_id) OVER (PARTITION BY h) AS keeper FROM base),
    feat AS (
      SELECT doc_id, lang,
        CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tok,
        CAST(len(list_filter(string_split(lower(text), ' '),
          t -> list_contains(['the','a','of','and','to'], t))) AS BIGINT) AS n_stop
      FROM keep WHERE keeper = doc_id)
    SELECT doc_id, lang, n_tok, n_stop FROM feat
    WHERE n_tok BETWEEN 20 AND 500 AND n_stop >= 1
    ORDER BY doc_id"""
}
