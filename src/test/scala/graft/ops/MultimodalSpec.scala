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

  test("PPM P6 payloads decode to normalized pixel rows") {
    // 2x2 image, maxval 200, with a header comment: pixels are
    // (0,100,200) (50,150,250→clipped to byte 250) / (10,20,30) (40,50,60)
    val header = "P6\n# crafted by spec\n2 2\n200\n".getBytes("US-ASCII")
    val pixels = Array(0, 100, 200, 50, 150, 250, 10, 20, 30, 40, 50, 60).map(_.toByte)
    val planes = Multimodal.decodePayload(header ++ pixels, "image")
    assert(planes.length == 2 && planes.forall(_.length == 6))
    assert(planes(0)(0) == 0f && planes(0)(1) == 0.5f && planes(0)(2) == 1f)
    assert(planes(0)(5) == 1.25f) // 250/200 — maxval scales, bytes may exceed it
    assert(planes(1)(3) == 0.2f && planes(1)(5) == 0.3f)
  }

  test("truncated or non-PPM payloads fail loudly instead of decoding garbage") {
    intercept[IllegalArgumentException] {
      Multimodal.decodePayload("P6\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3), "image")
    }
    // non-PPM image bytes and codec-less media types are explicit errors
    intercept[UnsupportedOperationException] {
      Multimodal.decodePayload(Array[Byte](1, 2, 3), "image")
    }
    intercept[UnsupportedOperationException] {
      Multimodal.decodePayload(Array[Byte](1, 2, 3), "audio")
    }
  }

  /** Little-endian helpers for crafting RIFF bytes. */
  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def wav(channels: Int, bits: Int, data: Array[Byte],
      extraChunk: Boolean = false): Array[Byte] = {
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(8000) ++ le32(8000 * channels * bits / 8) ++ le16(channels * bits / 8) ++ le16(bits)
    val skip = if (extraChunk) "LIST".getBytes("US-ASCII") ++ le32(3) ++
      Array[Byte](9, 9, 9, 0) // odd-size chunk + its alignment pad byte
    else Array.emptyByteArray
    val dat = "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
    val body = "WAVE".getBytes("US-ASCII") ++ fmt ++ skip ++ dat
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  test("WAV 16-bit stereo PCM decodes to per-channel normalized planes") {
    // frames (L,R): (0, 16384), (-32768, 32767) — two's complement LE
    val data = le16(0) ++ le16(16384) ++ le16(0x8000) ++ le16(0x7fff)
    val planes = Multimodal.decodePayload(wav(2, 16, data, extraChunk = true), "audio")
    assert(planes.length == 2 && planes.forall(_.length == 2))
    assert(planes(0)(0) == 0f && planes(0)(1) == -1f)
    assert(planes(1)(0) == 0.5f && planes(1)(1) == 32767f / 32768f)
  }

  test("WAV 8-bit mono is unsigned excess-128") {
    val data = Array(0, 128, 255).map(_.toByte)
    val planes = Multimodal.decodePayload(wav(1, 8, data), "audio")
    assert(planes.length == 1)
    assert(planes(0).toSeq == Seq(-1f, 0f, 127f / 128f))
  }

  test("WAV round-trip: random PCM encodes and decodes losslessly") {
    // seeded LCG — deterministic, no scalacheck needed for byte soup
    var state = 42L
    def nextInt(bound: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 33) % bound).toInt + bound) % bound
    }
    (1 to 20).foreach { i =>
      val channels = 1 + nextInt(4)
      val bits = if (nextInt(2) == 0) 8 else 16
      val frames = nextInt(50)
      val samples = Array.fill(channels, frames)(
        if (bits == 8) nextInt(256) else nextInt(65536) - 32768)
      val data = new Array[Byte](frames * channels * bits / 8)
      for (f <- 0 until frames; c <- 0 until channels) {
        val v = samples(c)(f)
        val o = (f * channels + c) * bits / 8
        if (bits == 8) data(o) = v.toByte
        else { data(o) = (v & 0xff).toByte; data(o + 1) = ((v >> 8) & 0xff).toByte }
      }
      val planes = Multimodal.decodePayload(wav(channels, bits, data), "audio")
      assert(planes.length == channels, s"case $i")
      for (c <- 0 until channels; f <- 0 until frames) {
        val want = if (bits == 8) (samples(c)(f) - 128) / 128f else samples(c)(f) / 32768f
        assert(planes(c)(f) == want, s"case $i ch $c frame $f")
      }
    }
  }

  test("compressed or truncated WAVs fail loudly") {
    // audioFormat 3 (IEEE float) must be rejected
    val floatFmt = wav(1, 16, le16(0))
    // patch audioFormat field (offset 20: RIFF(12) + id(4) + size(4))
    floatFmt(20) = 3
    intercept[IllegalArgumentException] { Multimodal.decodePayload(floatFmt, "audio") }
    // data chunk claiming more bytes than the payload carries
    val good = wav(1, 16, le16(0) ++ le16(1))
    val truncated = good.dropRight(2)
    intercept[IllegalArgumentException] { Multimodal.decodePayload(truncated, "audio") }
  }

  test("WAV chunk size overflowing Int fails loudly instead of walking backward") {
    val bytes = wav(1, 16, le16(0) ++ le16(1))
    // data chunk: RIFF(12) + fmt(8+16) → id at 36, u32 size at 40.
    // 0xfffffff0 as u32 > Int.MaxValue; pre-guard this wrapped toInt
    // negative and walked pos backward into a garbage parse.
    bytes(40) = 0xf0.toByte; bytes(41) = 0xff.toByte
    bytes(42) = 0xff.toByte; bytes(43) = 0xff.toByte
    val e = intercept[IllegalArgumentException] { Multimodal.decodePayload(bytes, "audio") }
    assert(e.getMessage.contains("corrupt WAV"))
  }
}
