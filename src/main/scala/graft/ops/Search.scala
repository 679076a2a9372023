package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** D23: lexical top-k retrieval — fixed-point BM25 over an inverted-posting
  * aggregation. The keyword-search counterpart of the ANN family (D6/D7/D13):
  * a user of the engine gets BOTH embedding-space and term-space search over
  * the same corpus.
  *
  * Shape (the one that survives 100 TB):
  *   - tokenize → explode → filter to the query's terms FIRST, so the
  *     shuffle carries only matching postings (O(matches), not O(tokens));
  *   - tf via groupBy(doc, term) — map-side partial agg collapses each
  *     partition to its distinct (doc, term) pairs before the wire;
  *   - df and corpus stats (N docs, Σdl) are tiny aggregates, broadcast
  *     back into the posting stream (no second big shuffle);
  *   - final ranking is orderBy+limit → TakeOrderedAndProject (per-partition
  *     top-k, only k rows per partition reach the driver-side merge).
  *
  * Scoring is BM25 (k1 = 6/5, b = 3/4) in EXACT integer arithmetic so the
  * DuckDB oracle hash-matches bit-for-bit (the repo-wide rule: no raw float
  * aggregation in checked outputs):
  *
  *   tf_norm           = tf·(k1+1) / (tf + k1·(1 − b + b·dl·N/Σdl))
  *   tfn_x1000         = 22·Σdl·tf·1000 DIV (10·Σdl·tf + 3·Σdl + 9·dl·N)
  *                       (both sides of the fraction multiplied by 10·Σdl)
  *   idf_x1e6          = (N − df + 1)·10⁶ DIV (df + 1)
  *                       (Robertson's (N − df + 0.5)/(df + 0.5) odds kept as
  *                       an exact rational; the log is MONOTONE, so dropping
  *                       it preserves every PER-TERM ranking and keeps the
  *                       oracle exact — engines disagree in the last ulp of
  *                       log(), which would break hash parity. NOTE: the
  *                       SUMMED multi-term score is a rank-consistent-per-
  *                       term BM25 VARIANT, not textbook BM25 — linear odds
  *                       weight rare terms more heavily than log-idf, so
  *                       multi-term result ORDER can diverge from log-idf
  *                       BM25; the oracle pins this variant's semantics)
  *   score             = Σ_terms idf_x1e6 · tfn_x1000
  *
  * Overflow bound: 22000·Σdl·tf < 2⁶³ holds to Σdl ≈ 4·10¹⁵ corpus tokens
  * per scoring domain; beyond that, shard the corpus and rank per shard
  * before the global top-k merge (which this plan already does).
  */
object Search {

  /** Fixed query: one rare term (df≈5% — the planted dup marker), one mid,
    * two common, so idf spread is actually exercised.
    */
  val QueryTerms: Seq[String] = Seq("dup", "spark", "window", "query")
  val TopK = 20

  def bm25(s: SparkSession, d: String, k: Int = TopK): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"), col("w"))
    // ONE corpus-stats scan yields n_docs, Σdl AND per-term df (document
    // frequency = docs where array_contains hits) as COLUMNS of a single
    // broadcast row. Deriving df from the tf frame instead re-executes the
    // whole tokenize+explode subtree — Catalyst prunes the branches
    // differently, so the exchange is never reused and the corpus is
    // exploded twice (observed: 2× the query cost at the 10× stress).
    val dfCols = QueryTerms.map(t =>
      sum(array_contains(col("w"), t).cast("long")).as(s"df_$t"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      (sum("dl").as("sum_dl") +: dfCols): _*)
    val dfOfTok = QueryTerms.tail.foldLeft(
      when(col("tok") === QueryTerms.head, col(s"df_${QueryTerms.head}"))) {
      (acc, t) => acc.when(col("tok") === t, col(s"df_$t"))
    }
    Tables.documents(s, d)
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
        explode(col("w")).as("tok"))
      .filter(col("tok").isin(QueryTerms: _*))
      .groupBy("doc_id", "dl", "tok").agg(count(lit(1)).as("tf"))
      .crossJoin(broadcast(stats))
      .withColumn("df", dfOfTok)
      .withColumn("idf_x1e6", expr("(n_docs - df + 1) * 1000000 DIV (df + 1)"))
      .withColumn("tfn_x1000",
        expr("22 * sum_dl * tf * 1000 DIV (10 * sum_dl * tf + 3 * sum_dl + 9 * dl * n_docs)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        sum(expr("idf_x1e6 * tfn_x1000")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** D24: inverted-index build — the index-construction half of lexical
    * search (bm25 is the query half): per term, document frequency,
    * collection frequency, and the docid-ordered posting-list prefix.
    *
    * Scale shape: explode → groupBy(term, doc) tf — map-side partials
    * collapse each partition to its distinct (term, doc) pairs — then a
    * per-term window ordered by doc_id. That per-term ordering IS the
    * posting-build cost of any search engine (docid-sorted lists are what
    * make intersection/delta-encoding work); a hot term's partition is the
    * size of its posting list, which a production build segments into
    * doc-range blocks — here the materialized prefix is capped at
    * [[PostingCap]] entries and the remainder is carried as counts only,
    * so no unbounded collect_list ever forms a row.
    */
  val PostingCap = 100

  def invertedIndex(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok", "doc_id").agg(count(lit(1)).as("tf"))
    val byTok = Window.partitionBy("tok").orderBy("doc_id")
    tf.withColumn("rn", row_number().over(byTok))
      .groupBy("tok")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"),
        concat_ws(",", sort_array(collect_list(
          when(col("rn") <= PostingCap, col("doc_id"))))).as("postings_prefix"))
      .orderBy("tok")
  }

  val indexOracleSql: String = s"""
    WITH tf AS (
      SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents) t
      WHERE len(tok) > 0 GROUP BY tok, doc_id)
    SELECT tok, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf,
      list_aggregate(list_slice(list_sort(list(doc_id)), 1, $PostingCap),
        'string_agg', ',') AS postings_prefix
    FROM tf GROUP BY tok ORDER BY tok"""

  val oracleSql: String = s"""
    WITH dl AS (
      SELECT doc_id, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl,
             string_split(lower(text), ' ') AS w
      FROM documents),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
    tf AS (
      SELECT doc_id, dl, tok, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, dl, unnest(w) AS tok FROM dl) t
      WHERE tok IN (${QueryTerms.map(t => s"'$t'").mkString(", ")})
      GROUP BY doc_id, dl, tok),
    dfv AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
    sc AS (
      SELECT doc_id,
        CAST((n_docs - df + 1) * 1000000 // (df + 1) AS BIGINT)
          * CAST(22 * sum_dl * tf * 1000 // (10 * sum_dl * tf + 3 * sum_dl + 9 * dl * n_docs) AS BIGINT)
          AS contrib
      FROM tf JOIN dfv USING (tok), stats)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms, CAST(sum(contrib) AS BIGINT) AS score
    FROM sc GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT $TopK"""
}
