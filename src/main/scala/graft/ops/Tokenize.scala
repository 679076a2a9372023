package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E14/E15: distributed BPE tokenizer induction + application — the
  * tokenizer-training step of an LLM data pipeline (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units"),
  * re-expressed as ONE declarative Catalyst plan.
  *
  * The classic scaling insight carries over directly: BPE never needs the
  * corpus after the first word count. `wordFreq` collapses 100 TB of text
  * to its VOCABULARY (a groupBy with map-side partial aggregation — the
  * wire carries distinct words per partition, not the corpus), and every
  * merge iteration operates on that vocabulary-sized relation:
  *
  *   pair counts  = explode adjacent symbol pairs weighted by word freq
  *                  (vocab-sized input, map-side combine again)
  *   chosen merge = a 1-ROW argmax (TakeOrderedAndProject), broadcast
  *   apply merge  = a codegen'd string `replace` per vocab word under a
  *                  BroadcastNestedLoopJoin against that 1 row
  *
  * No driver-side loop, no collect: the K merge steps UNFOLD into a single
  * logical plan (s_k = merge(s_{k-1}, argmax(pairs(s_{k-1})))), and the
  * repeated subtrees collapse at execution time — the word-count shuffle
  * and each step's pair-count shuffle/broadcast are planned ONCE and
  * reused everywhere else they appear (ReusedExchange, pinned in
  * PlanSpec). K is a compile-time knob; a production run wanting hundreds
  * of merges would localCheckpoint the vocab state every ~16 steps to
  * bound plan depth (precedent: Clustering's iterative CC), which changes
  * nothing semantically.
  *
  * Symbol sequences are encoded as U+001F-wrapped strings
  * ("␟a␟␟b␟␟c␟"): each symbol individually wrapped, so the pair (a,b) is
  * the literal substring "␟a␟␟b␟" and greedy leftmost non-overlapping
  * merging is exactly what engines' `replace` already does ("aaa" under
  * merge (a,a) → "aa"+"a", the standard BPE behavior — verified identical
  * in Spark and DuckDB). The sole assumption is that U+001F (ASCII unit
  * separator) never occurs inside a word; a corpus that can't promise
  * that would remap the separator first.
  *
  * Determinism (the oracle contract): ties in pair counts break on
  * (count DESC, left ASC, right ASC) under binary collation in both
  * engines, so the learned merge table is bit-stable — the DuckDB oracle
  * replays the identical K unrolled steps as CTEs.
  *
  * Single-symbol words are excluded from pair extraction on BOTH engines
  * (Spark's `sequence(1, 0)` DESCENDS rather than returning empty, so the
  * `size >= 2` guard is semantic, not cosmetic).
  */
object Tokenize {

  private val Sep = "\u001f"

  /** Merge steps in the registered queries (knob). */
  val Merges = 4

  /** Corpus → (word, freq): the ONLY corpus-sized stage. */
  private def wordFreq(s: SparkSession, d: String): DataFrame =
    Tables.fanOut(Tables.documents(s, d))
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))

  /** word → initial symbol sequence: each char individually ␟-wrapped. */
  private def seed(wf: DataFrame): DataFrame =
    wf.withColumn("seq",
      concat(lit(Sep), array_join(split(col("word"), ""), Sep + Sep), lit(Sep)))

  /** Adjacent-pair counts over the current vocab state (freq-weighted). */
  private def pairCounts(sk: DataFrame): DataFrame =
    sk.select(col("freq"),
        split(expr(s"trim(BOTH '$Sep' FROM seq)"), Sep + Sep).as("syms"))
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(syms) - 1), " +
          "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("freq").as("n"))

  /** The 1-row argmax with the deterministic tie-break. */
  private def argmax(pc: DataFrame): DataFrame =
    pc.orderBy(col("n").desc, col("a"), col("b")).limit(1)

  /** Apply one merge rule to every vocab word (broadcast 0-or-1 rows,
    * codegen'd replace — greedy leftmost, non-overlapping). A LEFT join,
    * not a cross join: when the corpus runs out of pairs before step K
    * the argmax frame is EMPTY, and the vocab state must pass through
    * unchanged rather than collapse to zero rows (the `coalesce` keeps
    * `seq` when the null merge row makes `replace` return null).
    */
  private def applyMerge(sk: DataFrame, m: DataFrame): DataFrame =
    sk.join(broadcast(m.select(col("a").as("__a"), col("b").as("__b"))), lit(true), "left")
      .withColumn("seq", coalesce(expr(
        s"replace(seq, concat('$Sep', __a, '$Sep$Sep', __b, '$Sep'), " +
          s"concat('$Sep', __a, __b, '$Sep'))"), col("seq")))
      .select("word", "freq", "seq")

  /** Unfold K merge steps; returns (merge rules m1..mK, final vocab state).
    *
    * The vocab state is localCheckpoint'd each step (the scaladoc's own
    * depth bound, semantics unchanged): without it s_k's plan tree holds
    * s_{k-1} TWICE (once directly, once inside m_k), so the logical plan
    * grows 2^K subtrees and Catalyst re-analyzes all of them — measured
    * at K=4/sf0.1, bpe_train spent 3.8 s of a 6.4 s wall in the driver
    * gap (planning), against 2.6 s of actual jobs (guide §7.3: very
    * large plans spend minutes in the optimizer; truncate them). Each
    * checkpoint is one vocab-sized job — the relation BPE already
    * collapsed the corpus to — and every m_k / pairCounts now plans
    * against constant-size checkpointed leaves.
    */
  private def unfold(s: SparkSession, d: String): (Seq[DataFrame], DataFrame) = {
    var cur = seed(wordFreq(s, d)).localCheckpoint()
    val ms = (1 to Merges).map { _ =>
      val m = argmax(pairCounts(cur))
      cur = applyMerge(cur, m).localCheckpoint()
      m
    }
    (ms, cur)
  }

  /** E14 `bpe_train`: the learned merge table — (step, left, right, count). */
  def bpeTrain(s: SparkSession, d: String): DataFrame = {
    val (ms, _) = unfold(s, d)
    ms.zipWithIndex.map { case (m, i) =>
      m.select(lit(i + 1).as("step"), col("a").as("left_sym"),
        col("b").as("right_sym"), col("n").as("pair_n"))
    }.reduce(_ unionAll _).orderBy("step")
  }

  /** E15 `bpe_encode`: apply the learned tokenizer back to the corpus —
    * per-doc token accounting (words, chars, post-merge symbols). The
    * final vocab state (word → symbol count) is a broadcast-sized map
    * joined at the scan; the corpus is touched exactly once.
    */
  def bpeEncode(s: SparkSession, d: String): DataFrame = {
    val (_, sK) = unfold(s, d)
    val vocab = sK.select(col("word"),
      size(split(expr(s"trim(BOTH '$Sep' FROM seq)"), Sep + Sep))
        .cast("long").as("n_syms_w"))
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(vocab), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word"))).as("n_chars_tok"),
        sum("n_syms_w").as("n_syms"))
      .orderBy("doc_id")
  }

  /** E18 `bpe_segment`: the actual token stream — every doc segmented
    * into its post-merge subword symbols, positioned by (word_pos,
    * sym_pos). This is the output a training-data exporter feeds to
    * `pack_sequences` (E5): train (E14) → segment (here) → pack.
    * Same shape as E15 — broadcast vocab join at the scan, corpus
    * touched once — but emitting the symbols themselves via one more
    * posexplode instead of aggregating counts. Output is token-grained
    * (≈ chars/2 rows per doc), the one relation in the library whose
    * cardinality EXCEEDS its input's; a production run writes it
    * sharded (E9) rather than sorting globally — the orderBy here is
    * oracle-comparison convenience at test scale.
    */
  def bpeSegment(s: SparkSession, d: String): DataFrame = {
    val (_, sK) = unfold(s, d)
    val vocab = sK.select(col("word"),
      split(expr(s"trim(BOTH '$Sep' FROM seq)"), Sep + Sep).as("syms"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), " ")).as(Seq("word_pos", "word")))
      .filter(col("word") =!= "")
      .join(broadcast(vocab), "word")
      .select(col("doc_id"), col("word_pos").cast("long").as("word_pos"),
        posexplode(col("syms")).as(Seq("sym_pos", "sym")))
      .select(col("doc_id"), col("word_pos"),
        col("sym_pos").cast("long").as("sym_pos"), col("sym"))
      .orderBy("doc_id", "word_pos", "sym_pos")
  }

  // ---- DuckDB oracles: the identical K steps unrolled as CTEs ----------

  private def oracleCtes: String = {
    val base = Seq(
      s"""wf AS (
         |  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
         |    SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents) t
         |  WHERE word <> '' GROUP BY word)""".stripMargin,
      s"""s0 AS (SELECT word, freq,
         |  '$Sep' || array_to_string(string_split(word, ''), '$Sep$Sep') || '$Sep' AS seq
         |  FROM wf)""".stripMargin)
    val steps = (1 to Merges).flatMap { k =>
      Seq(
        s"""p$k AS (
           |  SELECT syms[i] AS a, syms[i+1] AS b, CAST(sum(freq) AS BIGINT) AS n FROM (
           |    SELECT freq, syms, unnest(generate_series(1, len(syms) - 1)) AS i FROM (
           |      SELECT freq, string_split(trim(seq, '$Sep'), '$Sep$Sep') AS syms FROM s${k - 1})
           |    WHERE len(syms) >= 2)
           |  GROUP BY 1, 2)""".stripMargin,
        s"m$k AS (SELECT a, b, n FROM p$k ORDER BY n DESC, a, b LIMIT 1)",
        s"""s$k AS (
           |  SELECT word, freq, coalesce(
           |    replace(seq, '$Sep' || a || '$Sep$Sep' || b || '$Sep',
           |                 '$Sep' || a || b || '$Sep'), seq) AS seq
           |  FROM s${k - 1} LEFT JOIN m$k ON TRUE)""".stripMargin)
    }
    (base ++ steps).mkString("WITH ", ",\n", "")
  }

  def bpeTrainOracleSql: String = {
    val union = (1 to Merges).map { k =>
      s"SELECT $k AS step, a AS left_sym, b AS right_sym, n AS pair_n FROM m$k"
    }.mkString("\nUNION ALL\n")
    s"$oracleCtes\nSELECT * FROM (\n$union\n) ORDER BY step"
  }

  def bpeSegmentOracleSql: String =
    s"""$oracleCtes,
       |vocab AS (SELECT word,
       |  string_split(trim(seq, '$Sep'), '$Sep$Sep') AS syms FROM s$Merges),
       |words AS (
       |  SELECT doc_id, i - 1 AS word_pos, w[i] AS word FROM (
       |    SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i FROM (
       |      SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents) t0) t1
       |  WHERE w[i] <> '')
       |SELECT doc_id, CAST(word_pos AS BIGINT) AS word_pos,
       |  CAST(j - 1 AS BIGINT) AS sym_pos, syms[j] AS sym FROM (
       |  SELECT doc_id, word_pos, syms, unnest(generate_series(1, len(syms))) AS j
       |  FROM words JOIN vocab USING (word)) t2
       |ORDER BY doc_id, word_pos, sym_pos""".stripMargin

  def bpeEncodeOracleSql: String =
    s"""$oracleCtes,
       |vocab AS (SELECT word,
       |  CAST(len(string_split(trim(seq, '$Sep'), '$Sep$Sep')) AS BIGINT) AS n_syms_w
       |  FROM s$Merges)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(len(word)) AS BIGINT) AS n_chars_tok,
       |  CAST(sum(n_syms_w) AS BIGINT) AS n_syms
       |FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
       |      FROM documents) t JOIN vocab USING (word)
       |WHERE word <> ''
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
