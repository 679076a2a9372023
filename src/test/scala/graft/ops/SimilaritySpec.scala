package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("brute-force cosine ranks an identical vector first") {
    import s.implicits._
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(1.0f, 0.001f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)), (3L, Array(-1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("ann").toString
    e.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val rows = Similarity.annBruteforce(s, tmp)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val q0 = rows.filter(_._1 == 0L).sortBy(_._2).map(_._3)
    assert(q0.head == 1L)  // nearest
    assert(q0.last == 3L)  // opposite direction ranks last
  }

  test("LSH ANN achieves reasonable recall@10 vs brute force") {
    val bf = Similarity.annBruteforce(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val lsh = Similarity.annLsh(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = bf.keys.toSeq.sorted.map { q =>
      val r = lsh.getOrElse(q, Set.empty).intersect(bf(q)).size.toDouble / bf(q).size
      r
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.2, s"mean recall@10 $mean; per-query $recalls")
    // every LSH result list is well-formed top-k
    assert(lsh.values.forall(_.size <= 10))
  }

  test("IVF ANN achieves reasonable recall@10 vs brute force") {
    val bf = Similarity.annBruteforce(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Similarity.annIvf(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = bf.keys.toSeq.sorted.map { q =>
      ivf.getOrElse(q, Set.empty).intersect(bf(q)).size.toDouble / bf(q).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.2, s"mean IVF recall@10 $mean; per-query $recalls")
    assert(ivf.values.forall(_.size <= 10))
  }

  test("LSH-bucketed embedding dedup finds only true pairs with amplified recall") {
    val all = Similarity.dedupEmbedding(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.dedupEmbeddingLsh(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact verifier ⇒ zero false positives, every LSH pair is a true pair
    assert(lsh.subsetOf(all), s"false positives: ${lsh -- all}")
    // OR-amplification across NumTables tables must recover a usable
    // fraction of the all-pairs ground truth (one 6-plane table alone
    // collides ~7% at the 0.45 threshold)
    if (all.nonEmpty) {
      val recall = lsh.size.toDouble / all.size
      assert(recall >= 0.3, s"recall $recall over ${all.size} true pairs")
    }
  }

  test("semDedup drops only within-cluster near-dups, keeping the lowest id") {
    val d = "/root/testdata/sf0.001"
    val labels = graft.Tables.embeddings(s, d)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.get(1).toString.toLong).toMap
    val dropped = Similarity.semDedup(s, d).collect()
      .map(r => (r.getLong(0), r.get(1).toString.toLong, r.getLong(2)))
    dropped.foreach { case (vecId, label, keptBy) =>
      assert(labels(vecId) == label, s"$vecId labelled ${labels(vecId)} not $label")
      assert(labels(keptBy) == label, s"keeper $keptBy crosses clusters")
      assert(keptBy < vecId, "keeper must be the lower id of the pair")
    }
    // every dropped vector must be a true near-dup of its keeper:
    // cross-check against the all-pairs verifier restricted to same-label
    val allPairs = Similarity.dedupEmbedding(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    dropped.foreach { case (vecId, _, keptBy) =>
      assert(allPairs.contains((keptBy, vecId)),
        s"($keptBy,$vecId) not in the all-pairs ground truth")
    }
  }

  test("quantized cosine is deterministic and within 1e-3 of true cosine") {
    import s.implicits._
    import org.apache.spark.sql.functions._
    val e = Seq((0L, Array(0.3f, -0.7f, 0.65f)), (1L, Array(0.29f, -0.71f, 0.66f)))
      .toDF("vec_id", "embedding")
    val q = e.select(Similarity.quantize(col("embedding")).as("qv"))
      .withColumn("nq", Similarity.sqNorm(col("qv")))
    val Array(r0, r1) = q.collect()
    val (q0, n0) = (r0.getSeq[Long](0), r0.getLong(1))
    val (q1, n1) = (r1.getSeq[Long](0), r1.getLong(1))
    val dot = q0.zip(q1).map { case (a, b) => a * b }.sum
    val cos = dot / (math.sqrt(n0.toDouble) * math.sqrt(n1.toDouble))
    val expected = {
      val a = Array(0.3, -0.7, 0.65); val b = Array(0.29, -0.71, 0.66)
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    assert(math.abs(cos - expected) < 1e-3)
  }

  test("embed_quantize bounds reconstruction error and handles the zero vector") {
    import s.implicits._
    val e = Seq(
      (0L, Array(0.5f, -1.0f, 0.25f, 0.0f), "a"),
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f), "z")).toDF("vec_id", "embedding", "label")
    val tmp = java.nio.file.Files.createTempDirectory("quant").toString
    e.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = Similarity.embedQuantize(s, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    val (maxabs, _, maxErr) = out(0L)
    assert(maxabs == 10000L)
    // truncating int8 grid: per-element error < step = maxabs/127 (+1 for
    // the double truncation) — far below the 10^4 quantization grid itself
    assert(maxErr <= maxabs / 127 + 1, s"max_err $maxErr")
    assert(out(1L) == ((0L, 0L, 0L)), "zero vector → zero codes, zero error")
  }
}
