package graft.sources

import java.nio.file.{Files => JFiles, Path => JPath}

import graft.etl.Snapshots
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType

/** STREAMING writes into catalog tables — `df.writeStream.toTable("cat.t")`,
  * the DSv2 sink half the pure-SQL-catalog user was missing (the V1
  * `graft-snapshot` format sinks cover the path-addressed surface; a
  * named catalog table had readStream but not writeStream).
  *
  * One class serves every table flavor by composing two orthogonal
  * choices:
  *
  *  - the WRITER FACTORY owns the file layout — plain rolling files, or
  *    the same value-pure/bucket-pure clustered writers the batch path
  *    uses (streaming writes go through Spark's
  *    `RequiresDistributionAndOrdering` pipeline too, so the engine
  *    plans the clustering shuffle inside the micro-batch), each epoch
  *    staged under its own `epoch-<id>/` dir;
  *  - the COMMIT MODE owns the snapshot semantics — append
  *    ([[Snapshots.commitOcc]]), upsert-by-table-key on `morkey` tables
  *    ([[Snapshots.publishUpsertStagedBatch]] — ZERO re-write of the
  *    batch's rows; the tombstone is the only extra staging), or
  *    whole-table replace for `outputMode("complete")` (the streaming
  *    aggregation's full result as one OCC rewrite per epoch).
  *
  * Exactly-once is the layer's own replay contract: the epoch id rides
  * the pointer rename (`batchIdOverride`), so a replayed epoch is a
  * provable no-op at every crash point; attempt isolation is the same
  * message-allowlist kernel as the clustered batch writes
  * ([[GraftClusteredCommit.committedPaths]]) — a retried or speculative
  * attempt's leftovers are swept, never manifested. EMPTY epochs on an
  * existing table advance only the watermark; an unfounded table stays
  * unfounded (no schema to read back), leaving the empty founding epoch
  * re-deliverable — and still empty.
  */
private[sources] final class GraftStreamingWrite(
    spark: SparkSession,
    store: JPath,
    statsCols: Seq[String], // PHYSICAL
    factory: StreamingDataWriterFactory,
    baseDir: JPath,
    mode: GraftStreamMode,
    seedMeta: () => Map[String, String],
    autoCompact: Option[Int] = None,
    autoExpire: Option[Int] = None) extends StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = factory

  private def epochDir(epochId: Long): JPath = baseDir.resolve(s"epoch-$epochId")

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val dir = epochDir(epochId)
    try {
      if (Snapshots.lastBatchId(store).exists(_ >= epochId)) {
        // replayed epoch (sink committed, engine crashed before its own
        // commit log did): the rows are already in a snapshot — no-op
        if (JFiles.exists(dir)) GraftCatalog.rmTree(dir)
        return
      }
      val committed =
        if (JFiles.exists(dir)) GraftClusteredCommit.committedPaths(dir, messages)
        else Set.empty[String]
      val entries =
        if (committed.isEmpty) Nil
        else Snapshots.entriesForStagedDir(spark, store, dir, statsCols,
          only = Some(committed))
      if (entries.isEmpty) {
        if (JFiles.exists(dir)) GraftCatalog.rmTree(dir)
        Snapshots.advanceBatchWatermark(store, epochId)
        return
      }
      mode match {
        case GraftStreamAppend =>
          Snapshots.commitOcc(store, entries, Snapshots.OccAppend,
            seedMeta = seedMeta(), batchIdOverride = Some(epochId))
          // 'autocompact' dial: the sink self-heals the fragmentation
          // its own epochs create — selective fold of any partition
          // value past the threshold, AFTER the epoch committed (the
          // compaction snapshot carries the batch watermark, so the
          // replay contract is untouched). Best-effort by design:
          // maintenance must never fail ingestion.
          autoCompact.foreach { minFiles =>
            try { GraftMaintenance.compactPartitions(spark, store, minFiles,
              lenient = true); () }
            catch { case e: Exception =>
              org.slf4j.LoggerFactory.getLogger(classOf[GraftStreamingWrite])
                .warn(s"autocompact($minFiles) on $store skipped: ${e.getMessage}")
            }
          }
        case GraftStreamUpsert(keysPhys) =>
          Snapshots.publishUpsertStagedBatch(spark, store, entries, keysPhys,
            epochId)
          ()
        case GraftStreamComplete =>
          // outputMode("complete"): the epoch IS the whole result — a
          // continuously-maintained materialized view, one OCC rewrite
          // per epoch (same retry shape as batch INSERT OVERWRITE)
          var attempts = 0
          var done = false
          while (!done) {
            val base = Snapshots.currentId(store)
            try {
              Snapshots.commitOcc(store, entries,
                base.map(Snapshots.OccRewrite).getOrElse(Snapshots.OccAppend),
                seedMeta = seedMeta(), batchIdOverride = Some(epochId))
              done = true
            } catch {
              case _: Snapshots.CommitConflictException =>
                attempts += 1
                if (attempts >= 5) throw new Snapshots.CommitConflictException(
                  s"complete-mode epoch $epochId on $store lost the commit " +
                    s"race $attempts times")
            }
          }
      }
      // 'autoexpire' dial: keep only the newest K snapshots — the
      // retention bound a CONTINUOUS writer needs (a complete-mode
      // matview at one epoch a minute pins a full table copy per
      // snapshot; unbounded history is unbounded storage). Runs AFTER
      // the mode commit (and after any autocompact commit), best-effort:
      // a registered changefeed consumer's floor still REFUSES inside
      // expire — logged and retained, never fatal, exactly the
      // maintenance-never-fails-ingestion contract.
      autoExpire.foreach { keepN =>
        try {
          val cur = Snapshots.currentId(store).getOrElse(0)
          val keepFrom = cur - math.max(keepN, 1) + 1
          if (keepFrom > 1) { Snapshots.expire(store, keepFrom); () }
        } catch {
          case e: Exception =>
            org.slf4j.LoggerFactory.getLogger(classOf[GraftStreamingWrite])
              .warn(s"autoexpire($keepN) on $store skipped: ${e.getMessage}")
        }
      }
    } catch {
      case e: Throwable =>
        // the epoch's staging is only referenced by a manifest once the
        // commit SUCCEEDED; on any failure reclaim it whole (the
        // tombstone staging, if any, was already discarded by the
        // upsert helper)
        if (JFiles.exists(dir)) GraftCatalog.rmTree(dir)
        throw e
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val dir = epochDir(epochId)
    if (JFiles.exists(dir)) GraftCatalog.rmTree(dir)
  }

  override def toString: String = s"GraftStreamingWrite($store, $mode)"
}

/** Snapshot semantics of each streamed epoch. */
private[sources] sealed trait GraftStreamMode extends Serializable
private[sources] case object GraftStreamAppend extends GraftStreamMode
private[sources] final case class GraftStreamUpsert(keysPhys: Seq[String])
  extends GraftStreamMode
private[sources] case object GraftStreamComplete extends GraftStreamMode

/** Epoch-dir adapter over the clustered batch writer: each micro-batch
  * stages its value-pure/bucket-pure files under `epoch-<id>/`, so the
  * driver can manifest (or sweep) an epoch as a unit. The inner factory
  * is constructed executor-side per writer — all its inputs are the
  * serializable pieces the batch path ships anyway.
  */
private[sources] final class GraftEpochClusteredFactory(
    baseDir: String,
    physSchema: StructType,
    owFactory: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    conf: org.apache.spark.util.SerializableConfiguration,
    key: GraftClusterKey,
    sortIdx: Int,
    sortType: Option[org.apache.spark.sql.types.DataType],
    maxRecordsPerFile: Long) extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GraftClusteredWriterFactory(
      new java.io.File(baseDir, s"epoch-$epochId").toString,
      physSchema, owFactory, conf, key, sortIdx, sortType, maxRecordsPerFile)
      .createWriter(partitionId, taskId)
}

/** Plain (unkeyed) epoch writer — the streaming twin of the layer's
  * flat staging: one rolling parquet file per task per epoch (rolled at
  * `spark.sql.files.maxRecordsPerFile`), written DIRECTLY into
  * `epoch-<id>/`, with the same attempt-isolation contract as the
  * clustered writers (commit messages name this attempt's files; abort
  * deletes them).
  */
private[sources] final class GraftEpochPlainFactory(
    baseDir: String,
    physSchema: StructType,
    owFactory: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    conf: org.apache.spark.util.SerializableConfiguration,
    maxRecordsPerFile: Long) extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val dataDir = new java.io.File(baseDir, s"epoch-$epochId")

      private val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
        conf.value,
        new org.apache.hadoop.mapreduce.TaskAttemptID(
          new org.apache.hadoop.mapreduce.TaskID(
            new org.apache.hadoop.mapreduce.JobID("graft", 0),
            org.apache.hadoop.mapreduce.TaskType.MAP, partitionId),
          (taskId & Int.MaxValue).toInt))

      private var current: org.apache.spark.sql.execution.datasources.OutputWriter = null
      private var rowsInFile = 0L
      private var fileSeq = 0
      private val created = scala.collection.mutable.ArrayBuffer.empty[String]

      private def roll(): Unit = {
        if (current != null) current.close()
        val rel = f"part-$partitionId%05d-$fileSeq%04d-$taskId" +
          owFactory.getFileExtension(ctx)
        dataDir.mkdirs()
        fileSeq += 1
        created += rel
        current = owFactory.newInstance(new java.io.File(dataDir, rel).toString,
          physSchema, ctx)
        rowsInFile = 0L
      }

      override def write(row: InternalRow): Unit = {
        if (current == null ||
            (maxRecordsPerFile > 0 && rowsInFile >= maxRecordsPerFile)) roll()
        current.write(row)
        rowsInFile += 1
      }

      override def commit(): WriterCommitMessage = {
        if (current != null) { current.close(); current = null }
        GraftBucketedTaskFiles(created.toSeq)
      }

      override def abort(): Unit = {
        if (current != null) {
          try current.close() catch { case _: Throwable => () }
          current = null
        }
        created.foreach { rel =>
          val f = new java.io.File(dataDir, rel)
          if (f.exists()) f.delete()
        }
      }

      override def close(): Unit =
        if (current != null) { current.close(); current = null }
    }
}
