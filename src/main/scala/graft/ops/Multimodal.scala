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
  * binary PPM (P6) images natively — a pure-JVM header+pixel parse —
  * and fails loudly for formats that need a codec; the deterministic
  * fake decoder remains what the ORACLED queries run, keeping their
  * results codec-independent.
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
    * PPM (P6) images — a pure header+pixel parse needing no codec
    * library, exercised on crafted bytes in MultimodalSpec. The other
    * formats (JPEG→pixels, WAV→PCM, MP4→frames) need native codecs this
    * container doesn't ship and fail loudly; `fakeDecode` remains the
    * deterministic stand-in the ORACLED pipeline uses, so the
    * distributed plumbing stays testable independent of codecs.
    */
  def decodePayload(payload: Array[Byte], mediaType: String): Array[Array[Float]] =
    mediaType match {
      case "image" if payload.length >= 2 && payload(0) == 'P' && payload(1) == '6' =>
        decodePpm(payload)
      case other => throw new UnsupportedOperationException(
        s"no $other codec in this container (PPM/P6 images are decoded natively)")
    }

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
