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

  test("real decode remains an explicit stub") {
    intercept[NotImplementedError] {
      Multimodal.decodePayload(Array[Byte](1, 2, 3), "image")
    }
  }
}
