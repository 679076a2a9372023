package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** E7 `curate_pipeline`: each gate must fire on a doc built to trip it
  * and ONLY the clean doc may survive into the per-lang accounting.
  */
class CurateSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("pipeline composes dedup, gopher gates, repetition and decontamination") {
    import s.implicits._
    // 50 words, mean length in range, 2 stopwords, distinct trigrams
    val good = "the " + (1 to 48).map(i => s"word$i").mkString(" ") + " of"
    // shares its first 12 words with the eval doc → ≥8 shared 3-shingles
    val evalText = "the " + (1 to 48).map(i => s"eval$i").mkString(" ") + " of"
    val leaky = "the " + (1 to 11).map(i => s"eval$i").mkString(" ") + " " +
      (1 to 37).map(i => s"other$i").mkString(" ") + " of"
    val short = "the tiny doc of it"                          // < 50 words
    val repetitive = "the of " + Seq.fill(48)("spam").mkString(" ") // dup3 ≫ 0.3
    val docs = Seq(
      (0L, evalText, "en", "eval", evalText.length.toLong),  // 0 % 23 == 0 → eval slice
      (1L, good, "en", "web", good.length.toLong),
      (2L, short, "en", "web", short.length.toLong),
      (3L, leaky, "en", "web", leaky.length.toLong),
      (4L, repetitive, "en", "web", repetitive.length.toLong),
      (24L, good, "en", "mirror", good.length.toLong)         // exact dup of 1
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("pipe").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Curate.pipeline(s, tmp).collect()
    assert(out.length == 1, out.mkString("; "))
    val r = out.head
    assert(r.getString(0) == "en")
    assert(r.getLong(1) == 1L, "only the clean doc survives")
    assert(r.getLong(2) == 50L, "its 50 tokens are accounted")
  }

  test("sampleWeighted plans a bounded top-k and tilts the sample toward heavy docs") {
    val df = Curate.sampleWeighted(s, TestSpark.sf)
    // the k smallest priorities must be a TakeOrderedAndProject (per-
    // partition heaps, k-row driver merge) — never a global Sort+Limit
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    // Exp(w) priorities: inclusion odds scale with token count, so the
    // 100-doc sample's mean token count must exceed the corpus mean
    val sampleMean = df.collect().map(_.getAs[Long]("n_tokens")).sum / 100.0
    val corpus = graft.Tables.documents(s, TestSpark.sf)
    val corpusMean = corpus
      .selectExpr("avg(size(split(text, ' '))) AS m").collect()(0).getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean should exceed corpus mean $corpusMean")
  }

  test("domain_mix flattens the head stratum: minority kept whole, majority downsampled") {
    import s.implicits._
    // 160 docs "big" vs 10 docs "small": w = isqrt → 12 vs 3, budget = 85,
    // target_big = 85*12/15 = 68 → rate 425000/1e6; target_small = 85*3/15
    // = 17 ≥ 10 → rate capped at 1e6 (kept whole).
    val docs = ((0 until 160).map(i => (i.toLong, s"doc $i", "big")) ++
      (200 until 210).map(i => (i.toLong, s"doc $i", "small")))
      .toDF("doc_id", "text", "lang")
    val tmp = java.nio.file.Files.createTempDirectory("mix").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Curate.domainMix(s, tmp).collect()
    val small = out.filter(_.getString(1) == "small")
    val big = out.filter(_.getString(1) == "big")
    assert(small.length == 10, "capped rate keeps the minority stratum whole")
    assert(small.forall(_.getLong(3) == 1000000L))
    assert(big.forall(_.getLong(3) == 425000L))
    assert(big.length < 160 && big.length > 0, "majority stratum is downsampled")
  }

  test("sourceReputation counts normalized dups per source and blocks at 30%") {
    import s.implicits._
    // d0/d1 differ only in case+whitespace → same normalized hash (both dup);
    // d4 (srcB) duplicates d0 cross-source → srcA 2/3 dup, srcB 1/3 dup
    val docs = Seq(
      (0L, "Hello  world here", "srcA"),
      (1L, "hello world here", "srcA"),
      (2L, "something else entirely", "srcA"),
      (3L, "unique text one", "srcB"),
      (4L, "HELLO WORLD HERE", "srcB"),
      (5L, "unique text two", "srcB")
    ).toDF("doc_id", "text", "source")
    val tmp = java.nio.file.Files.createTempDirectory("srcrep").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Curate.sourceReputation(s, tmp).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(5))))
      .toMap
    assert(out("srcA") == ((3L, 2L, 666L, true)), out.toString)
    assert(out("srcB") == ((3L, 1L, 333L, true)), out.toString)
  }

  test("curationFunnel attributes each doc to its first failing stage and partitions the corpus") {
    import s.implicits._
    val good = "the " + (1 to 48).map(i => s"word$i").mkString(" ") + " of"
    val evalText = "the " + (1 to 48).map(i => s"eval$i").mkString(" ") + " of"
    val leaky = "the " + (1 to 11).map(i => s"eval$i").mkString(" ") + " " +
      (1 to 37).map(i => s"other$i").mkString(" ") + " of"
    val short = "the tiny doc of it"
    val repetitive = "the of " + Seq.fill(48)("spam").mkString(" ")
    val docs = Seq(
      (0L, evalText, "en"), (1L, good, "en"), (2L, short, "en"),
      (3L, leaky, "en"), (4L, repetitive, "en"), (24L, good, "en")
    ).toDF("doc_id", "text", "lang")
    val tmp = java.nio.file.Files.createTempDirectory("funl").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Curate.curationFunnel(s, tmp).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("1_eval_holdout" -> 1L, "2_exact_dup" -> 1L, "3_word_count" -> 1L,
      "7_repetition" -> 1L, "8_contaminated" -> 1L, "9_kept" -> 1L), out.toString)
    assert(out.values.sum == 6L, "stages partition the corpus — the report sums to the input")
  }

  test("qualityVote counts the component signals and keeps on majority") {
    val d = "/root/testdata/sf0.001"
    val qv = Curate.qualityVote(s, d).collect()
    assert(qv.nonEmpty)
    qv.foreach { r =>
      val votes = (1 to 4).map(i => if (r.getBoolean(i)) 1L else 0L).sum
      assert(r.getLong(5) == votes, s"votes must sum the four signals: $r")
      assert(r.getBoolean(6) == (votes >= 3), s"keep is the >=3 majority: $r")
    }
    val gopher = TextAnalysis.gopherFilter(s, d).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    qv.foreach(r => assert(r.getBoolean(1) == gopher(r.getLong(0)),
      "v_gopher must equal the D21 component's keep"))
  }

  test("heavyHitters finds exactly the >1/32-share tokens through the MG sketch") {
    import s.implicits._
    // 2 hot tokens + 200 distinct rare fillers (≫ k=64, so the sketch
    // must decrement and merge); spread across 64 docs/partitions.
    // N = 300+200+200 = 700; threshold n*32 > 700 → n ≥ 22: hot1, hot2 only.
    val docs = ((0 until 50).map(i => (i.toLong, Seq.fill(6)("hot1").mkString(" "))) ++
      (50 until 100).map(i => (i.toLong, Seq.fill(4)("hot2").mkString(" "))) ++
      (100 until 150).map(i => (i.toLong, (0 until 4).map(j => s"rare${i}x$j").mkString(" "))))
      .toDF("doc_id", "text").repartition(16)
    val tmp = java.nio.file.Files.createTempDirectory("hh").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Curate.heavyHitters(s, tmp).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.keySet == Set("hot1", "hot2"), out.toString)
    assert(out("hot1") == ((300L, 428L)), out.toString) // 300*1000/700
    assert(out("hot2") == ((200L, 285L)), out.toString)
  }

  test("shardAssign gives contiguous positions and monotone fill per shard, reproducibly") {
    val d = "/root/testdata/sf0.001"
    val out = Curate.shardAssign(s, d).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(0), r.getLong(3)))
    assert(out.map(_._3).distinct.length == out.length, "every doc exactly once")
    assert(out.forall(t => t._1 >= 0 && t._1 < 16))
    out.groupBy(_._1).foreach { case (shard, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to rows.length).toSeq,
        s"shard $shard positions must be 1..n")
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq,
        s"shard $shard cum_chars must be monotone")
    }
    val again = Curate.shardAssign(s, d).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(0), r.getLong(3)))
    assert(out.toSeq == again.toSeq, "assignment is a pure function of doc_id")
  }

  test("curriculumOrder interleaves score tiers round-robin with no global sort") {
    import s.implicits._
    // 80 docs, scores 1..80 → 8 tiers of exactly 10 docs each
    val docs = (1L to 80L).map(i => (i, s"doc $i", "en", "web", i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("curr").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Curate.curriculumOrder(s, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 80)
    assert(out.map(_._3).distinct.length == 80, "seq_pos unique")
    // tier = (score-1)/10 for this uniform histogram
    assert(out.forall { case (id, tier, _) => tier == (id - 1) / 10 }, out.take(16).mkString("; "))
    // the first 8 training positions cover all 8 tiers (round-robin prefix)
    assert(out.sortBy(_._3).take(8).map(_._2).toSet == (0L to 7L).toSet)
    // interleave is arithmetic: seq_pos = (pos_in_tier-1)*8 + tier
    val byTier = out.groupBy(_._2)
    byTier.foreach { case (tier, rows) =>
      val pos = rows.sortBy(_._1).zipWithIndex
      assert(pos.forall { case ((_, _, sp), i) => sp == i.toLong * 8 + tier },
        s"tier $tier positions wrong")
    }
  }

  test("shardManifest checksum is order- and partitioning-independent") {
    val d = "/root/testdata/sf0.001"
    val base = Curate.shardManifest(s, d).collect().map(_.toSeq)
    // same corpus, adversarial partitioning → bit-identical manifest
    val docs = graft.Tables.documents(s, d).repartition(7)
    val tmp = java.nio.file.Files.createTempDirectory("mani").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val shuffled = Curate.shardManifest(s, tmp).collect().map(_.toSeq)
    assert(base.toSeq == shuffled.toSeq)
    assert(base.map(_.apply(1).asInstanceOf[Long]).sum ==
      graft.Tables.documents(s, d).count(), "every doc in exactly one shard")
  }

  test("split_leakproof: dup groups never straddle splits; per-doc split would") {
    val d = TestSpark.sf
    val rows = Curate.splitLeakproof(s, d).collect()
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("train", "val", "test")))
    rows.foreach(r => assert(r.getLong(3) == 0L, "leak: a dup group straddles splits"))
    // partition property: every doc in exactly one split
    assert(rows.map(_.getLong(1)).sum == graft.Tables.documents(s, d).count())
    // train is the bulk (hash split 80/10/10; exact share is group-mass
    // dependent, so assert the ordering, not the ratio)
    val byName = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.getOrElse("train", 0L) > byName.getOrElse("val", 0L))
    // negative control: the same corpus split PER DOC (the bug this
    // operator exists to prevent) DOES put copies of one group on both
    // sides — proving the gate detects what it claims to.
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(s, d)
      .select(col("doc_id"), md5(col("text")).as("h"))
    val groups = docs.groupBy("h").agg(min(col("doc_id")).as("group_id"))
    // duplicate every doc under a shifted id so every group has ≥2 docs
    val withCopies = docs.unionByName(
      docs.select((col("doc_id") + 1000000L).as("doc_id"), col("h")))
    val perDoc = withCopies.join(groups, Seq("h"))
      .withColumn("split", (col("doc_id") % 100003L) * 40503L % 100L < 80)
    val straddlePerDoc = perDoc.groupBy("group_id")
      .agg(countDistinct(col("split")).as("ns")).filter(col("ns") > 1).count()
    assert(straddlePerDoc > 0, "negative control failed to produce a leak")
  }
}
