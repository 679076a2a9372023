package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  test("binary media table + partition-batched feature extraction") {
    val s = TestSpark.spark
    val media = Multimodal.mediaTable(s, TestSpark.sf)
    assert(media.schema("payload").dataType.typeName == "binary")
    val feats = Multimodal.extractFeatures(s, media).collect()
    assert(feats.length == media.count())
    assert(feats.forall(f => f.n_bytes > 0 && f.frames_sampled >= 1 && f.frames_sampled <= 4))
    // mean byte of ASCII-ish text payloads is in a sane range
    assert(feats.forall(f => f.mean_byte_x100 > 3000 && f.mean_byte_x100 < 13000))
  }

  test("frame sampling picks up to 4 evenly-spaced distinct indices") {
    val s = TestSpark.spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // framesQuery reads the documents table; replicate its index rule on
    // controlled n_frames values instead
    val idx = Seq(1, 2, 4, 24).toDF("n_frames")
      .select(col("n_frames"),
        array_distinct(transform(sequence(lit(0), lit(3)), j =>
          floor(j * (col("n_frames") - 1) / 3).cast("long"))).as("idxs"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(idx(1) == Seq(0L))
    assert(idx(2) == Seq(0L, 1L))
    assert(idx(4) == Seq(0L, 1L, 2L, 3L))
    assert(idx(24) == Seq(0L, 7L, 15L, 23L))
  }

  test("real decode remains an explicit stub") {
    intercept[NotImplementedError] {
      Multimodal.decodePayload(Array[Byte](1, 2, 3), "image")
    }
  }
}
