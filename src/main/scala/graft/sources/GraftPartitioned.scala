package graft.sources

import java.nio.file.{Path => JPath}

import graft.etl.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetWrite
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType

/** Write paths of a PARTITIONED catalog table (`PARTITIONED BY (p)` →
  * `partitioncol` property; storage is the layer's value-pure `_pv=`
  * layout, [[Snapshots.publishOverwrite]]'s scheme):
  *
  *  - `INSERT INTO` (append): value-pure staged files over the carried
  *    manifest — an OCC append like any other.
  *  - `INSERT OVERWRITE` in STATIC mode (truncate): whole-table rewrite,
  *    still value-pure so the partition story survives the statement.
  *  - `INSERT OVERWRITE` in DYNAMIC mode: replace EXACTLY the partitions
  *    the query produced rows for, carry every other partition's entries
  *    byte-identical (same relPath, same MD5, same seq) — the
  *    reference's replace-one-db-keep-the-tree release (Base.pm:123-144)
  *    as one SQL statement. Dynamic overwrite has no V1 fallback in
  *    Spark, so it runs as a real DSv2 [[BatchWrite]]: rows land in a
  *    scratch dir through Spark's own parquet write, then a driver-side
  *    split re-stages them value-pure and commits ONE
  *    [[Snapshots.OccSurgical]] with the untouched partitions carried.
  *
  * The partition column doubles as a degenerate `v:v` zone map (when
  * integral), so partition pruning rides the existing plan-time zone
  * skipping with zero new reader machinery. I/O of a dynamic overwrite
  * is O(replaced partitions); at 100 TB replacing one partition of a
  * thousand costs that partition, never the table.
  */
/** Write paths of a BUCKETED catalog table (`PARTITIONED BY
  * (bucket(n, c))` → `bucketcol`/`bucketn` properties): append and
  * truncate-overwrite land through [[Snapshots.stageOccBucketed]] —
  * `_pv=<bucket id>` dirs, id = pmod(murmur3(c), n), matching the
  * catalog's `bucket` function identity — so every committed file
  * proves its bucket and the scan can report key-grouped output.
  * Dynamic partition overwrite is deliberately NOT offered: "replace
  * the bucket ids my query produced" is not a statement with user-level
  * meaning (ids are hashes, not domains).
  */
private[sources] final class GraftBucketedWriteBuilder(
    spark: SparkSession,
    store: JPath,
    bucketCol: String, // PHYSICAL name
    bucketN: Int,
    statsCol: Option[String],
    tableSchema: StructType,
    colMap: Map[String, String] = Map.empty,
    sortCol: Option[String] = None) extends WriteBuilder
    with SupportsTruncate {

  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }

  private def toPhysical(df: DataFrame): DataFrame =
    if (colMap.isEmpty) df
    else df.toDF(df.columns.map(c => colMap.getOrElse(c, c)).toIndexedSeq: _*)

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, ov: Boolean): Unit = {
          // an overwrite can be signaled EITHER through truncate() or
          // the InsertableRelation flag — honor both, like the
          // unpartitioned builder (`overwrite || ov`)
          val replacing = overwrite || ov
          var attempts = 0
          while (true) {
            val base = Snapshots.currentId(store)
            // the sort column's zone range is the reader's ordering
            // proof — always recorded alongside the declared statscol
            val fresh = Snapshots.stageOccBucketed(spark, store,
              toPhysical(data), bucketCol, bucketN,
              (statsCol.toSeq ++ sortCol.toSeq).distinct, sortCol)
            // an empty APPEND has nothing to commit (an empty OVERWRITE
            // is a truncate and must still land)
            if (fresh.isEmpty && !replacing) return
            try {
              val seed = GraftCatalog.seedMetaFor(store)
              (if (replacing) base else None) match {
                case Some(b) =>
                  Snapshots.commitOcc(store, fresh, Snapshots.OccRewrite(b),
                    seedMeta = seed)
                case None =>
                  Snapshots.commitOcc(store, fresh, Snapshots.OccAppend,
                    seedMeta = seed)
              }
              return
            } catch {
              case _: Snapshots.CommitConflictException if replacing =>
                attempts += 1
                Snapshots.discardStaged(store, fresh)
                if (attempts >= 5) throw new Snapshots.CommitConflictException(
                  s"INSERT OVERWRITE on $store lost the commit race $attempts times")
              case e: Throwable =>
                Snapshots.discardStaged(store, fresh)
                throw e
            }
          }
        }
      }
  }
}

private[sources] final class GraftPartitionedWriteBuilder(
    spark: SparkSession,
    store: JPath,
    partCol: String, // PHYSICAL name (what files carry; stable across renames)
    statsCol: Option[String],
    tableSchema: StructType, // LOGICAL shape (what the query hands us)
    info: LogicalWriteInfo,
    colMap: Map[String, String] = Map.empty) extends WriteBuilder
    with SupportsTruncate with SupportsDynamicOverwrite {

  private var mode: String = "append"

  override def truncate(): WriteBuilder = { mode = "truncate"; this }
  override def overwriteDynamicPartitions(): WriteBuilder = { mode = "dynamic"; this }

  /** Zone-map columns for staged files: the declared stats column plus
    * the partition column itself when integral (value-pure files make
    * its range degenerate `v:v` — free partition pruning). Both names
    * PHYSICAL — what the staged files carry.
    */
  private def zoneCols: Seq[String] = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integralPart = tableSchema.fields
      .find(f => colMap.getOrElse(f.name, f.name) == partCol)
      .exists(f => f.dataType == LongType || f.dataType == IntegerType ||
        f.dataType == ShortType || f.dataType == ByteType)
    (statsCol.toSeq ++ (if (integralPart) Seq(partCol) else Nil)).distinct
  }

  /** Incoming frames carry LOGICAL names; files carry PHYSICAL. */
  private def toPhysical(df: DataFrame): DataFrame =
    if (colMap.isEmpty) df
    else df.toDF(df.columns.map(c => colMap.getOrElse(c, c)).toIndexedSeq: _*)

  private def stage(df: DataFrame): Seq[Snapshots.ManifestEntry] =
    Snapshots.stageOccPartitioned(spark, store, toPhysical(df), partCol, zoneCols)

  override def build(): Write = mode match {
    case "append" => new V1Write {
      override def toInsertableRelation: InsertableRelation =
        new InsertableRelation {
          override def insert(data: DataFrame, ov: Boolean): Unit = {
            val fresh = stage(data)
            try Snapshots.commitOcc(store, fresh, Snapshots.OccAppend,
              seedMeta = GraftCatalog.seedMetaFor(store))
            catch { case e: Throwable => Snapshots.discardStaged(store, fresh); throw e }
          }
        }
    }
    case "truncate" => new V1Write {
      override def toInsertableRelation: InsertableRelation =
        new InsertableRelation {
          override def insert(data: DataFrame, ov: Boolean): Unit = {
            var attempts = 0
            while (true) {
              val base = Snapshots.currentId(store)
              val fresh = stage(data)
              try {
                val seed = GraftCatalog.seedMetaFor(store)
                base match {
                  case Some(b) =>
                    Snapshots.commitOcc(store, fresh, Snapshots.OccRewrite(b),
                      seedMeta = seed)
                  case None =>
                    Snapshots.commitOcc(store, fresh, Snapshots.OccAppend,
                      seedMeta = seed)
                }
                return
              } catch {
                case _: Snapshots.CommitConflictException =>
                  attempts += 1
                  Snapshots.discardStaged(store, fresh)
                  if (attempts >= 5) throw new Snapshots.CommitConflictException(
                    s"INSERT OVERWRITE on $store lost the commit race $attempts times")
                case e: Throwable =>
                  Snapshots.discardStaged(store, fresh)
                  throw e
              }
            }
          }
        }
    }
    case "dynamic" =>
      new GraftDynamicOverwrite(spark, store, partCol, info, stage)
  }
}

/** The DSv2 dynamic-partition-overwrite write: scratch the incoming
  * rows (one delegated parquet writer per task), then split-and-commit
  * driver-side — replaced partitions staged value-pure, untouched
  * partitions carried verbatim, one atomic surgical commit, conflicts
  * retried against the fresh base (the scratch outlives a retry, so
  * only the small split re-runs).
  */
private[sources] final class GraftDynamicOverwrite(
    spark: SparkSession,
    store: JPath,
    partCol: String,
    info: LogicalWriteInfo,
    stage: DataFrame => Seq[Snapshots.ManifestEntry]) extends Write {

  private val scratchDir: JPath = {
    val d = store.resolve("data").resolve(
      "overwrite-scratch-" + java.util.UUID.randomUUID().toString)
    java.nio.file.Files.createDirectories(d)
    d
  }

  private val scratchWrite: ParquetWrite =
    ParquetWrite(Seq(scratchDir.toString), "parquet", _ => true, info)

  override def description(): String = s"GraftDynamicOverwrite($store, $partCol)"

  override def toBatch: BatchWrite = new BatchWrite {
    private val delegate = scratchWrite.toBatch

    override def useCommitCoordinator(): Boolean = delegate.useCommitCoordinator()

    override def createBatchWriterFactory(p: PhysicalWriteInfo): DataWriterFactory =
      delegate.createBatchWriterFactory(p)

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      delegate.commit(messages)
      try {
        val scratch = spark.read.schema(info.schema()).parquet(scratchDir.toString)
        if (scratch.isEmpty) return // no rows ⇒ no partitions replaced
        var attempts = 0
        while (true) {
          val base = Snapshots.currentId(store)
          val fresh = stage(scratch)
          val touched = fresh.flatMap(e => Snapshots.partValueOf(e.relPath)).toSet
          try {
            base match {
              case Some(b) =>
                val carried = Snapshots.manifest(store, b).filter { e =>
                  if (Snapshots.isDelete(e)) true // tombstones carry through
                  else Snapshots.partValueOf(e.relPath) match {
                    case Some(v) => !touched(v)
                    case None => throw new IllegalStateException(
                      s"non-partitioned data file ${e.relPath}: dynamic overwrite " +
                        "needs a value-pure table (write through the partitioned " +
                        "catalog paths only)")
                  }
                }
                Snapshots.commitOcc(store, fresh, Snapshots.OccSurgical(b, carried),
                  seedMeta = GraftCatalog.seedMetaFor(store))
              case None =>
                Snapshots.commitOcc(store, fresh, Snapshots.OccAppend,
                  seedMeta = GraftCatalog.seedMetaFor(store))
            }
            return
          } catch {
            case _: Snapshots.CommitConflictException =>
              attempts += 1
              Snapshots.discardStaged(store, fresh)
              if (attempts >= 5) throw new Snapshots.CommitConflictException(
                s"dynamic INSERT OVERWRITE on $store lost the commit race $attempts times")
            case e: Throwable =>
              Snapshots.discardStaged(store, fresh)
              throw e
          }
        }
      } finally GraftCatalog.rmTree(scratchDir)
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      try delegate.abort(messages)
      finally GraftCatalog.rmTree(scratchDir)
    }
  }
}
