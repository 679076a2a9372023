package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Drives a REAL Structured Streaming execution over driver testdata and
  * hands its sink back as a batch DataFrame — the harness that puts the
  * streaming PATH itself (file source → micro-batches → state-store
  * round-trips → watermark choreography → sink) under the driver's
  * DuckDB oracle gate, instead of only a batch twin of the same
  * transformation.
  *
  * Mechanics: the batch input is staged into `nFiles` event-time-ranged
  * parquet files and tailed with `maxFilesPerTrigger = 1`, so the query
  * genuinely crosses `nFiles` micro-batch boundaries (every stateful
  * operator serializes/deserializes its state between each pair). For
  * watermarked Append-mode aggregations, a SENTINEL row far past the
  * data's horizon lands as one more file: its batch advances the
  * watermark beyond every real window's end, closing and emitting them
  * all, while the sentinel's own window stays open and is never emitted
  * — the same feed-then-flush choreography StreamingSpec pins with
  * MemoryStream, here executed on the file-source path the reference's
  * nightly drops would use (new dump lands in the dir ⇒ new micro-batch,
  * DownloadDatabase.pm:87-115's poll-for-new-files loop as a stream).
  *
  * Scale note: this harness is a TEST/verify surface — the memory sink
  * gathers results on the driver, sized for gate SFs. Production streams
  * write to real sinks; the transforms under test are identical either
  * way, which is exactly the point.
  */
object StreamRun {

  /** Stage `input` as `nFiles` files, stream it through `transform` in
    * Append mode, optionally flush with `sentinel`, return the sink.
    */
  def toSink(s: SparkSession, input: DataFrame, tsCol: String, nFiles: Int,
             transform: DataFrame => DataFrame,
             sentinel: Option[DataFrame] = None): DataFrame = {
    val dir = Files.createTempDirectory("graft_stream_src").toString
    input.repartitionByRange(nFiles, col(tsCol))
      .write.mode("overwrite").parquet(dir)
    val src = s.readStream.schema(input.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val name = "graft_sink_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = transform(src).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable()
    sentinel.foreach { extra =>
      extra.write.mode("append").parquet(dir)
      // the sentinel batch advances the watermark; Spark then runs the
      // extra no-data batch that evicts/emits closed state, and
      // processAllAvailable blocks until it has
      q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    s.table(name)
  }
}
