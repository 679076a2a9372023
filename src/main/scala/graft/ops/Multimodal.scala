package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** D12: multimodal columns — media as opaque `binary` payloads with typed
  * metadata, plus batch-shaped decode plumbing.
  *
  * The payloads here are synthesized from document text (no image/audio
  * codec LIBRARIES exist in this container), but every Spark-side
  * mechanism is real: binary column + metadata struct schema,
  * partition-batched decode via `mapPartitions` over a typed Dataset
  * (the Scala analog of `mapInPandas` batches). `decodePayload` decodes
  * binary PPM (P6) images and WAV/PCM audio natively — pure-JVM
  * header+sample parses — and fails loudly for formats that need a real
  * codec (JPEG, MP4); the deterministic fake decoder remains what the
  * ORACLED queries run, keeping their results codec-independent.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte],
                               width: Int, height: Int, n_frames: Int)
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, mean_byte_x100: Long,
                                 frames_sampled: Int)

  /** The media table: binary payload + typed metadata derived
    * deterministically from payload size.
    */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image").when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      col("text").cast("binary").as("payload"),
      (lit(64) + octet_length(col("text")) % 512).cast("int").as("width"),
      (lit(64) + (octet_length(col("text")) * 7) % 512).cast("int").as("height"),
      (lit(1) + octet_length(col("text")) % 24).cast("int").as("n_frames"))

  /** Decode a media payload to planes of floats. IMPLEMENTED for binary
    * PPM (P6) images and RIFF WAV/PCM audio — pure header+sample parses
    * needing no codec library, exercised on crafted bytes in
    * MultimodalSpec. The remaining formats (JPEG→pixels, MP4→frames)
    * need native codecs this container doesn't ship and fail loudly;
    * `fakeDecode` remains the deterministic stand-in the ORACLED
    * pipeline uses, so the distributed plumbing stays testable
    * independent of codecs.
    */
  def decodePayload(payload: Array[Byte], mediaType: String): Array[Array[Float]] =
    mediaType match {
      case "image" if payload.length >= 2 && payload(0) == 'P' && payload(1) == '6' =>
        decodePpm(payload)
      case "audio" if payload.length >= 12 && magic(payload, 0, "RIFF") &&
          magic(payload, 8, "WAVE") =>
        decodeWavPcm(payload)
      case other => throw new UnsupportedOperationException(
        s"no $other codec in this container (PPM/P6 images and WAV/PCM audio decode natively)")
    }

  private def magic(p: Array[Byte], off: Int, s: String): Boolean =
    s.indices.forall(i => p(off + i) == s.charAt(i).toByte)

  /** Binary PPM (P6): ASCII header `P6 <w> <h> <maxval>` (with `#`
    * comments), one whitespace byte, then w·h·3 raw RGB bytes. Returns
    * `h` rows of `w·3` floats in [0,1]. Fails loudly on truncated pixel
    * data or maxval > 255 (2-byte-sample PPMs are out of scope).
    */
  def decodePpm(payload: Array[Byte]): Array[Array[Float]] = {
    var pos = 2 // past "P6"
    def skipToToken(): Unit = {
      var in = true
      while (in && pos < payload.length) {
        val c = payload(pos).toChar
        if (c == '#') { while (pos < payload.length && payload(pos) != '\n') pos += 1 }
        else if (c.isWhitespace) pos += 1
        else in = false
      }
    }
    def token(): Int = {
      skipToToken()
      var v = 0
      require(pos < payload.length && payload(pos).toChar.isDigit, "malformed PPM header")
      while (pos < payload.length && payload(pos).toChar.isDigit) {
        v = v * 10 + (payload(pos) - '0'); pos += 1
      }
      v
    }
    val (w, h, maxval) = (token(), token(), token())
    require(maxval > 0 && maxval <= 255, s"unsupported PPM maxval $maxval")
    pos += 1 // the single whitespace after maxval
    require(payload.length - pos >= w * h * 3,
      s"truncated PPM: need ${w * h * 3} pixel bytes, have ${payload.length - pos}")
    Array.tabulate(h) { row =>
      val base = pos + row * w * 3
      Array.tabulate(w * 3)(i => (payload(base + i) & 0xff).toFloat / maxval)
    }
  }

  /** WAV (RIFF) with uncompressed PCM samples: `RIFF <size> WAVE`, then
    * word-aligned chunks — `fmt ` (must be audioFormat 1 = linear PCM,
    * 8- or 16-bit samples) and `data` (interleaved frames). Returns one
    * plane per channel, samples normalized to [-1, 1] (8-bit is unsigned
    * excess-128, 16-bit little-endian two's complement — per the RIFF
    * spec). Fails loudly on compressed/float formats, missing chunks, or
    * a data chunk that overruns the payload — a truncated file must not
    * decode to silence.
    */
  def decodeWavPcm(payload: Array[Byte]): Array[Array[Float]] = {
    def u16(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = u16(o).toLong | (u16(o + 2).toLong << 16)
    var pos = 12
    var channels = 0
    var bits = 0
    var fmtSeen = false
    var dataOff = -1
    var dataLen = 0L
    while (pos + 8 <= payload.length) {
      val id = new String(payload, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = u32(pos + 4)
      // Guard BEFORE advancing: a corrupt/huge u32 size would overflow
      // `size.toInt` negative and walk pos backward — fail loudly instead.
      require(size <= payload.length.toLong - pos - 8,
        s"corrupt WAV: chunk '$id' at $pos claims $size bytes, have ${payload.length - pos - 8}")
      id match {
        case "fmt " =>
          val audioFormat = u16(pos + 8)
          require(audioFormat == 1, s"unsupported WAV audio format $audioFormat (PCM only)")
          channels = u16(pos + 10)
          bits = u16(pos + 22)
          fmtSeen = true
        case "data" =>
          dataOff = pos + 8
          dataLen = size
        case _ => () // LIST/INFO and friends: skipped
      }
      pos += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned (size ≤ remaining, so toInt is exact)
    }
    require(fmtSeen, "WAV missing fmt chunk")
    require(dataOff >= 0, "WAV missing data chunk")
    require(bits == 8 || bits == 16, s"unsupported PCM sample width $bits")
    require(channels > 0, "WAV with zero channels")
    require(dataOff + dataLen <= payload.length,
      s"truncated WAV: data chunk claims $dataLen bytes, have ${payload.length - dataOff}")
    val bytesPerSample = bits / 8
    val frames = (dataLen / (channels * bytesPerSample)).toInt
    Array.tabulate(channels) { c =>
      Array.tabulate(frames) { f =>
        val o = dataOff + (f * channels + c) * bytesPerSample
        if (bits == 8) ((payload(o) & 0xff) - 128) / 128f
        else (((payload(o) & 0xff) | (payload(o + 1) << 8)).toShort) / 32768f
      }
    }
  }

  /** Deterministic fake "decode": per-record features from raw bytes. */
  def fakeDecode(r: MediaRecord): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < r.payload.length) { sum += r.payload(i) & 0xff; i += 1 }
    val mean = if (r.payload.length == 0) 0L else sum * 100 / r.payload.length
    MediaFeatures(r.doc_id, r.payload.length, mean, math.min(r.n_frames, 4))
  }

  /** Batch decode: one decoder invocation per partition iterator, the
    * shape a native codec wants (amortized init, streaming batches).
    */
  def extractFeatures(s: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    val sq = s; import sq.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition decoder init would happen here (once per task)
      it.map(fakeDecode)
    }
  }

  /** D12 query: metadata + payload digest (SQL-checkable: all fields are
    * integer/string functions of the text payload).
    */
  def metaQuery(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d).select(
      col("doc_id"), col("media_type"),
      octet_length(col("payload")).as("n_bytes"),
      col("width"), col("height"), col("n_frames"),
      md5(col("payload")).as("payload_md5"))
      .orderBy("doc_id")

  /** D12b query: the batched decode path itself under the oracle — the
    * typed-Dataset `mapPartitions` pipeline (the Scala analog of
    * `mapInPandas`) runs for real; only the codec inside is fake, and the
    * fake is byte arithmetic DuckDB can replay. Feature extraction,
    * aspect-preserving resize targets (max side 256, integer math), and
    * the sampled-frame count all come out of one pass.
    */
  def featuresQuery(s: SparkSession, d: String): DataFrame = {
    val media = mediaTable(s, d)
    extractFeatures(s, media).toDF()
      .join(media.select(col("doc_id"), col("media_type"), col("width"), col("height")), Seq("doc_id"))
      .select(col("doc_id"), col("media_type"), col("n_bytes"), col("mean_byte_x100"),
        col("frames_sampled"),
        when(greatest(col("width"), col("height")) <= 256, col("width"))
          .otherwise(expr("width * 256 DIV greatest(width, height)")).as("out_w"),
        when(greatest(col("width"), col("height")) <= 256, col("height"))
          .otherwise(expr("height * 256 DIV greatest(width, height)")).as("out_h"))
      .orderBy("doc_id")
  }

  /** D12c query: uniform frame sampling — up to 4 evenly-spaced frame
    * indices per video (j·(n−1) DIV 3, deduplicated), exploded to one row
    * per sampled frame with a deterministic frame digest. The explode is
    * the real fan-out shape of a frame-extraction stage: rows multiply,
    * payload bytes don't (the digest stands in for the decoded frame).
    */
  def framesQuery(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .filter(col("media_type") === "video")
      .select(col("doc_id"), col("payload"), col("n_frames"),
        explode(array_distinct(transform(sequence(lit(0), lit(3)), j =>
          floor(j * (col("n_frames") - 1) / 3).cast("long")))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(concat(col("payload").cast("string"), lit(":"), col("frame_idx"))).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")
}
