package graft.sources

import java.nio.file.{Path => JPath}

import scala.jdk.CollectionConverters._

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
  * truncate-overwrite land through [[GraftBucketedBatchWrite]] —
  * `_pv=<bucket id>` dirs, id = pmod(murmur3(c), n), matching the
  * catalog's `bucket` function identity — so every committed file
  * proves its bucket and the scan can report key-grouped output.
  * Dynamic partition overwrite is deliberately NOT offered: "replace
  * the bucket ids my query produced" is not a statement with user-level
  * meaning (ids are hashes, not domains).
  */
private[sources] class GraftBucketedWriteBuilder(
    spark: SparkSession,
    store: JPath,
    bucketCol: String, // PHYSICAL name
    bucketN: Int,
    statsCol: Option[String],
    tableSchema: StructType,
    colMap: Map[String, String] = Map.empty,
    sortCol: Option[String] = None,
    info: Option[LogicalWriteInfo] = None,
    morKeysPhys: Seq[String] = Nil) extends WriteBuilder
    with SupportsTruncate {

  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }

  /** The query side binds LOGICAL names; the distribution/ordering
    * expressions the engine resolves must too.
    */
  private def logicalOf(phys: String): String =
    colMap.collectFirst { case (l, p) if p == phys => l }.getOrElse(phys)

  /** The DSv2 write-side layout contract
    * ([[org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering]]):
    * instead of the staging kernel repartitioning the frame itself, the
    * WRITE declares `clustered(bucket(n, c))` — resolved through the
    * catalog's own FunctionCatalog, the same `bucket` identity the
    * scan's key-grouped output reports — plus the per-partition
    * ordering `[bucket, sortcol]`, and SPARK plans the write shuffle:
    * `requiredNumPartitions = 0` leaves the partition count to AQE,
    * which sizes it from the actual shuffle bytes instead of a fixed
    * `spark.sql.shuffle.partitions`. This requires a REAL DSv2
    * [[BatchWrite]]: Spark's V1 write fallback hands InsertableRelation
    * the ANALYZED query, so the prepared distribution/ordering nodes
    * never reach a V1 insert (measured: the plan carried no exchange).
    * [[GraftBucketedBatchWrite]]'s writers then receive rows already
    * clustered and sorted and write bucket-pure files DIRECTLY, rolling
    * at bucket-id boundaries — no second shuffle, no restaging job, no
    * write amplification.
    */
  override def build(): Write = new GraftBucketedBatchWrite(
    spark, store, bucketCol, bucketN,
    (statsCol.toSeq ++ sortCol.toSeq).distinct, sortCol,
    tableSchema, colMap, logicalOf(bucketCol), sortCol.map(logicalOf),
    () => overwrite,
    info.getOrElse(throw new IllegalStateException(
      "bucketed catalog write needs its LogicalWriteInfo")),
    morKeysPhys)
}

private[sources] class GraftPartitionedWriteBuilder(
    spark: SparkSession,
    store: JPath,
    partCol: String, // PHYSICAL name (what files carry; stable across renames)
    statsCol: Option[String],
    tableSchema: StructType, // LOGICAL shape (what the query hands us)
    info: LogicalWriteInfo,
    colMap: Map[String, String] = Map.empty,
    specFrom: Option[Int] = None,
    clusteredOptOut: Boolean = false,
    morKeysPhys: Seq[String] = Nil) extends WriteBuilder
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

  private def logicalOf(phys: String): String =
    colMap.collectFirst { case (l, p) if p == phys => l }.getOrElse(phys)

  /** Identity-partitioned writes join the DSv2 layout contract when the
    * partition type path-renders exactly (integral/string/date/timestamp
    * — the same set the scan's claims accept): the write declares
    * `clustered(p)` + `[p asc]` ordering, the engine plans (and AQE
    * sizes) the clustering shuffle, and the rolling writer lands ~one
    * file per partition value instead of one per (task × value) — the
    * small-files explosion every unclustered partitioned insert pays at
    * scale. Timestamps render as UTC epoch-micros (the catalyst
    * internal), never the session-timezone partitionBy form — the V1
    * legs' [[Snapshots.stageOccPartitioned]] renders the same, so the
    * `'writedistribution'='none'` dial stays consistent.
    */
  private[sources] def clusteredCapable: Boolean = {
    import org.apache.spark.sql.types._
    !clusteredOptOut &&
    tableSchema.fields.find(f => colMap.getOrElse(f.name, f.name) == partCol)
      .map(_.dataType).exists {
        case LongType | IntegerType | ShortType | ByteType | StringType |
             DateType | TimestampType => true
        case _ => false
      }
  }

  override def build(): Write =
    if (clusteredCapable)
      new GraftPartitionedBatchWrite(spark, store, partCol, zoneCols,
        tableSchema, colMap, logicalOf(partCol), mode, info, specFrom,
        morKeysPhys)
    else buildV1(mode)

  private def buildV1(mode: String): Write = mode match {
    case "append" => new V1Write {
      override def toInsertableRelation: InsertableRelation =
        new InsertableRelation {
          override def insert(data: DataFrame, ov: Boolean): Unit = {
            val fresh = stage(data)
            try Option(info.options.get("branch")) match {
              case Some(b) =>
                Snapshots.commitStagedToBranch(store, fresh, b, append = true)
              case None =>
                Snapshots.commitOcc(store, fresh, Snapshots.OccAppend,
                  seedMeta = GraftCatalog.seedMetaFor(store))
            }
            catch { case e: Throwable => Snapshots.discardStaged(store, fresh); throw e }
          }
        }
    }
    case "truncate" => new V1Write {
      override def toInsertableRelation: InsertableRelation =
        new InsertableRelation {
          override def insert(data: DataFrame, ov: Boolean): Unit = {
            Option(info.options.get("branch")) match {
              case Some(b) =>
                val fresh = stage(data)
                try Snapshots.commitStagedToBranch(store, fresh, b, append = false)
                catch { case e: Throwable =>
                  Snapshots.discardStaged(store, fresh); throw e }
                return
              case None => ()
            }
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
      if (Option(info.options.get("branch")).isDefined)
        throw new UnsupportedOperationException(
          "dynamic partition overwrite has no branch face — append to or " +
            "truncate the branch")
      new GraftDynamicOverwrite(spark, store, partCol, info, stage, specFrom,
        tableSchema.fields
          .find(f => colMap.getOrElse(f.name, f.name) == partCol)
          .exists(_.dataType == org.apache.spark.sql.types.TimestampType))
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
    stage: DataFrame => Seq[Snapshots.ManifestEntry],
    specFrom: Option[Int] = None,
    partIsTimestamp: Boolean = false) extends Write {

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
                  // mid-spec-migration files carry _pv= segments rendered
                  // under the OLD spec: "replace the partitions my query
                  // produced" is not judgeable against them — refuse
                  // rather than replace (or keep) the wrong files
                  if (!Snapshots.isDelete(e) && specFrom.exists(e.seq <= _))
                    throw new IllegalStateException(
                      s"dynamic overwrite on $store mid-spec-migration: file " +
                        s"${e.relPath} predates the current partition spec " +
                        "(compact or INSERT OVERWRITE the whole table first)")
                  if (Snapshots.isDelete(e)) true // tombstones carry through
                  else {
                    GraftDynamicGuards.requireJudgeablePv(store, e, partIsTimestamp)
                    Snapshots.partValueOf(e.relPath) match {
                      case Some(v) => !touched(v)
                      case None => throw new IllegalStateException(
                        s"non-partitioned data file ${e.relPath}: dynamic overwrite " +
                          "needs a value-pure table (write through the partitioned " +
                          "catalog paths only)")
                    }
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

/** The REAL DSv2 write of a bucketed catalog table. The engine owns the
  * layout work: [[RequiresDistributionAndOrdering]] declares
  * `clustered(bucket(n, c))` + ordering `[bucket, sortcol]`, Spark
  * injects the exchange (AQE-sized: `requiredNumPartitions = 0`) and
  * the sort into the WRITE's own plan, and each task then receives its
  * buckets' rows contiguously and in order — the writer just ROLLS to a
  * new `_pv=<id>` file whenever the bucket id changes. One pipeline, no
  * restaging job, no second shuffle, no write amplification; the commit
  * is the same `entriesForStagedDir` → `commitOcc` path as every other
  * bucketed staging (md5/zone-map integrity identical). A task that
  * somehow receives rows out of order (the contract violated) REFUSES
  * rather than landing a file whose sort-column zone range would prove
  * an ordering the bytes don't have.
  */
private[sources] final class GraftBucketedBatchWrite(
    spark: SparkSession,
    store: JPath,
    bucketColPhys: String,
    bucketN: Int,
    statsCols: Seq[String], // PHYSICAL
    sortColPhys: Option[String],
    tableSchema: StructType, // LOGICAL
    colMap: Map[String, String],
    bucketColLogical: String,
    sortColLogical: Option[String],
    replacing: () => Boolean,
    info: LogicalWriteInfo,
    morKeysPhys: Seq[String] = Nil) extends Write
    with RequiresDistributionAndOrdering {

  import org.apache.spark.sql.connector.distributions.{Distribution => V2Distribution, Distributions}
  import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder => V2SortOrder}

  private val bucketExpr = Expressions.bucket(bucketN, bucketColLogical)

  override def requiredDistribution(): V2Distribution =
    Distributions.clustered(Array(bucketExpr))

  override def requiredOrdering(): Array[V2SortOrder] =
    (Expressions.sort(bucketExpr, SortDirection.ASCENDING) +:
      sortColLogical.toSeq.map(sc =>
        Expressions.sort(Expressions.column(sc), SortDirection.ASCENDING))).toArray

  override def requiredNumPartitions(): Int = 0 // AQE sizes the shuffle

  /** UNSORTED bucketed writes take the identity write's skew path:
    * clustering preferred, not strict, so AQE may split a hot bucket
    * across tasks (several bucket-pure files for that id — the
    * partially-clustered scan already chunks multi-file buckets) and
    * coalesce cold ones. SORTED buckets stay STRICT: two tasks sharing
    * a bucket would land overlapping sort ranges, and the scan's
    * ordering claim (pairwise-disjoint zone ranges per bucket) would
    * silently decline — the declared price of `sortcol` is the
    * clustered shuffle, so it stays whole.
    */
  override def distributionStrictlyRequired(): Boolean = sortColPhys.isDefined

  override def description(): String = s"GraftBucketedBatchWrite($store)"

  /** `writeStream.toTable` into a bucketed catalog table — bucket-pure
    * epoch staging through the same clustered writer (sorted buckets
    * keep their strict clustering and in-file ordering: the engine
    * plans the shuffle and sort inside the micro-batch write, and the
    * writer still REFUSES out-of-order rows rather than land a false
    * zone claim). Commit semantics per [[GraftStreamingWrite]]: append,
    * upsert on `morkey` tables, complete-mode replace.
    */
  override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
    require(Option(info.options.get("branch")).isEmpty,
      "branch writes have no streaming face — epochs commit to _current " +
        "(stage a mirror table and adopt, or drop the option)")
    val inSchema = info.schema()
    val physSchema = StructType(inSchema.fields.map(f =>
      f.copy(name = colMap.getOrElse(f.name, f.name))).toIndexedSeq)
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      spark.sessionState.newHadoopConf())
    val owFactory =
      new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat()
        .prepareWrite(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
          job, Map.empty, physSchema)
    val bIdx = inSchema.fieldNames.indexOf(bucketColLogical)
    require(bIdx >= 0, s"bucket column '$bucketColLogical' missing from the " +
      s"write schema ${inSchema.fieldNames.mkString(",")}")
    val sIdx = sortColLogical.map(inSchema.fieldNames.indexOf(_)).getOrElse(-1)
    val baseDir = store.resolve("data").resolve(
      "stream-" + java.util.UUID.randomUUID().toString)
    java.nio.file.Files.createDirectories(baseDir)
    val factory = new GraftEpochClusteredFactory(baseDir.toString, physSchema,
      owFactory,
      new org.apache.spark.util.SerializableConfiguration(job.getConfiguration),
      GraftBucketKey(bIdx, inSchema.fields(bIdx).dataType, bucketN),
      sIdx, if (sIdx >= 0) Some(inSchema.fields(sIdx).dataType) else None,
      spark.sessionState.conf.maxRecordsPerFile)
    val streamMode =
      if (replacing()) GraftStreamComplete
      else if (morKeysPhys.nonEmpty) GraftStreamUpsert(morKeysPhys)
      else GraftStreamAppend
    new GraftStreamingWrite(spark, store, statsCols, factory, baseDir,
      streamMode, () => GraftCatalog.seedMetaFor(store),
      autoCompact = GraftCatalog.readMarker(store)._2
        .get("autocompact").flatMap(_.toIntOption),
      autoExpire = GraftCatalog.readMarker(store)._2
        .get("autoexpire").flatMap(_.toIntOption))
  }

  override def toBatch: BatchWrite = new BatchWrite {
    private val dataDir: JPath = {
      val d = store.resolve("data").resolve(
        "occ-" + java.util.UUID.randomUUID().toString)
      java.nio.file.Files.createDirectories(d)
      d
    }

    override def createBatchWriterFactory(
        pInfo: PhysicalWriteInfo): DataWriterFactory = {
      val inSchema = info.schema()
      // files carry PHYSICAL names: positional rename of the input shape
      val physSchema = StructType(inSchema.fields.map(f =>
        f.copy(name = colMap.getOrElse(f.name, f.name))).toIndexedSeq)
      val job = org.apache.hadoop.mapreduce.Job.getInstance(
        spark.sessionState.newHadoopConf())
      val owFactory =
        new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat()
          .prepareWrite(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
            job, Map.empty, physSchema)
      val bIdx = inSchema.fieldNames.indexOf(bucketColLogical)
      require(bIdx >= 0, s"bucket column '$bucketColLogical' missing from the " +
        s"write schema ${inSchema.fieldNames.mkString(",")}")
      val sIdx = sortColLogical.map(inSchema.fieldNames.indexOf(_)).getOrElse(-1)
      new GraftClusteredWriterFactory(dataDir.toString, physSchema, owFactory,
        new org.apache.spark.util.SerializableConfiguration(job.getConfiguration),
        GraftBucketKey(bIdx, inSchema.fields(bIdx).dataType, bucketN),
        sIdx, if (sIdx >= 0) Some(inSchema.fields(sIdx).dataType) else None,
        spark.sessionState.conf.maxRecordsPerFile)
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val committed = GraftClusteredCommit.committedPaths(dataDir, messages)
      val fresh = Snapshots.entriesForStagedDir(spark, store, dataDir, statsCols,
        only = Some(committed))
      val isReplace = replacing()
      if (fresh.isEmpty && !isReplace) { GraftCatalog.rmTree(dataDir); return }
      // branch (WAP) target: the SAME bucket-pure staged files — the
      // layout claims survive adoption — only the commit moves the ref
      Option(info.options.get("branch")) match {
        case Some(b) =>
          try Snapshots.commitStagedToBranch(store, fresh, b, append = !isReplace)
          catch { case e: Throwable =>
            Snapshots.discardStaged(store, fresh); throw e }
          return
        case None => ()
      }
      var attempts = 0
      while (true) {
        val base = Snapshots.currentId(store)
        try {
          val seed = GraftCatalog.seedMetaFor(store)
          (if (isReplace) base else None) match {
            case Some(b) =>
              Snapshots.commitOcc(store, fresh, Snapshots.OccRewrite(b),
                seedMeta = seed)
            case None =>
              Snapshots.commitOcc(store, fresh, Snapshots.OccAppend,
                seedMeta = seed)
          }
          return
        } catch {
          // a rewrite replaces whatever is current, so the staged set is
          // base-independent: retry against the advanced base
          case _: Snapshots.CommitConflictException if isReplace =>
            attempts += 1
            if (attempts >= 5) {
              Snapshots.discardStaged(store, fresh)
              throw new Snapshots.CommitConflictException(
                s"INSERT OVERWRITE on $store lost the commit race $attempts times")
            }
          case e: Throwable =>
            Snapshots.discardStaged(store, fresh)
            throw e
        }
      }
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      GraftCatalog.rmTree(dataDir)
  }
}

/** Commit message of a clustered-write task: the dataDir-RELATIVE
  * paths of exactly the files the COMMITTED attempt created. The driver
  * manifests only paths named in these messages — a failed-then-retried
  * or speculative task's leftovers (attempt-unique names, so they
  * coexist on disk) are swept, never committed. This is the attempt
  * isolation Spark's Hadoop commit protocol gives its own file writes,
  * re-expressed for the direct-to-staging clustered writer.
  */
private[sources] final case class GraftBucketedTaskFiles(paths: Seq[String])
  extends WriterCommitMessage

/** How a clustered-write task derives each row's `_pv=` DIRECTORY NAME
  * — the serializable key spec shipped to executors.
  */
private[sources] sealed trait GraftClusterKey extends Serializable
private[sources] final case class GraftBucketKey(
    idx: Int, dt: org.apache.spark.sql.types.DataType, n: Int) extends GraftClusterKey
private[sources] final case class GraftIdentityKey(
    idx: Int, dt: org.apache.spark.sql.types.DataType) extends GraftClusterKey

private[sources] object GraftDynamicGuards {
  /** Dynamic overwrite judges carried files BY their rendered `_pv=`
    * value; on a TIMESTAMP-partitioned table every graft write renders
    * UTC epoch-micros, but a file adopted from (or written by) a
    * pre-micros session-timezone rendering is NOT comparable — matching
    * it against the fresh micros values would silently carry (duplicate)
    * the very partition being replaced. Refuse, exactly like the
    * mid-spec-migration case: maintenance (compact / whole-table
    * overwrite) re-renders, then dynamic overwrite is judgeable again.
    */
  def requireJudgeablePv(store: JPath, e: Snapshots.ManifestEntry,
                         partIsTimestamp: Boolean): Unit =
    if (partIsTimestamp) Snapshots.partValueOf(e.relPath).foreach { pv =>
      if (scala.util.Try(pv.toLong).isFailure) throw new IllegalStateException(
        s"dynamic overwrite on $store: file ${e.relPath} carries a " +
          "non-epoch-micros (legacy session-timezone) timestamp partition " +
          "rendering — compact or INSERT OVERWRITE the whole table first")
    }
}

private[sources] object GraftClusteredCommit {
  /** The attempt-isolation kernel shared by both clustered BatchWrites:
    * collect the dataDir-relative paths the COMMITTED attempts reported,
    * then sweep any parquet under the staging dir NOT in that set — a
    * leftover from a failed attempt whose abort() never ran (executor
    * crash) or a speculative loser still flushing. Only message-named
    * files are ever manifested.
    */
  def committedPaths(dataDir: JPath,
                     messages: Array[WriterCommitMessage]): Set[String] = {
    val committed: Set[String] = messages.iterator
      .filter(_ != null)
      .collect { case GraftBucketedTaskFiles(ps) => ps }
      .flatten.toSet
    val walk = java.nio.file.Files.walk(dataDir)
    try walk.iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet") &&
        !committed(dataDir.toAbsolutePath.relativize(p.toAbsolutePath).toString))
      .foreach(java.nio.file.Files.deleteIfExists(_))
    finally walk.close()
    committed
  }
}

private[sources] object GraftClusterKey {
  /** The dir-name rendering MUST byte-match what Spark's own
    * `partitionBy` produced on the historical files: integral toString,
    * strings through Spark's hive path escaping, dates as the ISO local
    * date (what the scan's round-trip parses back), null and ""
    * collapsing to the default-partition dir — or a dynamic overwrite
    * would replace (or keep) the wrong directories.
    */
  def renderer(key: GraftClusterKey):
      org.apache.spark.sql.catalyst.InternalRow => String = key match {
    case GraftBucketKey(idx, dt, n) =>
      val hashExpr =
        new org.apache.spark.sql.catalyst.expressions.Murmur3Hash(Seq(
          org.apache.spark.sql.catalyst.expressions.BoundReference(
            idx, dt, nullable = true)))
      row => {
        val h = hashExpr.eval(row).asInstanceOf[Int]
        (((h % n) + n) % n).toString
      }
    case GraftIdentityKey(idx, dt) =>
      import org.apache.spark.sql.types._
      val default =
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.DEFAULT_PARTITION_NAME
      row => {
        if (row.isNullAt(idx)) default
        else dt match {
          case LongType    => row.getLong(idx).toString
          case IntegerType => row.getInt(idx).toString
          case ShortType   => row.getShort(idx).toString
          case ByteType    => row.getByte(idx).toString
          case DateType    =>
            java.time.LocalDate.ofEpochDay(row.getInt(idx).toLong).toString
          // UTC epoch-micros: the catalyst internal long verbatim —
          // timezone-free, exact round-trip, and what every other write
          // path (stageOccPartitioned) renders for timestamps
          case TimestampType => row.getLong(idx).toString
          case StringType =>
            val v = row.getUTF8String(idx).toString
            if (v.isEmpty) default
            else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .escapePathName(v)
          case other => throw new IllegalStateException(
            s"unrenderable identity partition type $other") // gated at build
        }
      }
  }
}

private[sources] final class GraftClusteredWriterFactory(
    dataDir: String,
    physSchema: StructType,
    owFactory: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    conf: org.apache.spark.util.SerializableConfiguration,
    key: GraftClusterKey,
    sortIdx: Int,
    sortType: Option[org.apache.spark.sql.types.DataType],
    maxRecordsPerFile: Long = 0L) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long):
      DataWriter[org.apache.spark.sql.catalyst.InternalRow] =
    new DataWriter[org.apache.spark.sql.catalyst.InternalRow] {
      import org.apache.spark.sql.catalyst.InternalRow

      private val ctx = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
        conf.value,
        new org.apache.hadoop.mapreduce.TaskAttemptID(
          new org.apache.hadoop.mapreduce.TaskID(
            new org.apache.hadoop.mapreduce.JobID("graft", 0),
            org.apache.hadoop.mapreduce.TaskType.MAP, partitionId),
          (taskId & Int.MaxValue).toInt))

      private val keyOf = GraftClusterKey.renderer(key)

      // integral sort value accessor (validateSortCol pins integral)
      private val sortValOf: InternalRow => Long = sortType match {
        case Some(org.apache.spark.sql.types.LongType)    => _.getLong(sortIdx)
        case Some(org.apache.spark.sql.types.IntegerType) => _.getInt(sortIdx).toLong
        case Some(org.apache.spark.sql.types.ShortType)   => _.getShort(sortIdx).toLong
        case Some(org.apache.spark.sql.types.ByteType)    => _.getByte(sortIdx).toLong
        case _ => _ => Long.MinValue
      }

      private var current: org.apache.spark.sql.execution.datasources.OutputWriter = null
      private var currentKey: String = null
      private var lastSort = Long.MinValue
      private var fileSeq = 0
      // dataDir-relative paths THIS attempt created — the commit message
      // (the driver manifests only message-named files) and the abort
      // cleanup list (a failed attempt deletes its own files, so a retry
      // never leaves partial parquet beside the winner's)
      private val created = scala.collection.mutable.ArrayBuffer.empty[String]

      private def roll(k: String): Unit = {
        if (current != null) current.close()
        val rel = s"_pv=$k/" +
          f"part-$partitionId%05d-$fileSeq%04d-$taskId" +
          owFactory.getFileExtension(ctx)
        val dir = new java.io.File(dataDir, s"_pv=$k")
        dir.mkdirs()
        fileSeq += 1
        created += rel
        current = owFactory.newInstance(new java.io.File(dataDir, rel).toString,
          physSchema, ctx)
        currentKey = k
        lastSort = Long.MinValue
      }

      private var rowsInFile = 0L

      override def write(row: InternalRow): Unit = {
        val k = keyOf(row)
        // roll at value boundaries (purity) AND at Spark's own
        // maxRecordsPerFile bound (a 10 GB hot partition must not land
        // one 10 GB file). A size roll within a SORTED run keeps the
        // ordering claim: consecutive slices of an ascending run carry
        // pairwise-disjoint zone ranges by construction.
        if (current == null || k != currentKey ||
            (maxRecordsPerFile > 0 && rowsInFile >= maxRecordsPerFile)) {
          val sizeRoll = current != null && k == currentKey
          val prevSort = lastSort
          roll(k)
          // a size roll continues the same sorted run: the order check
          // must survive the file boundary, not reset
          if (sizeRoll) lastSort = prevSort
          rowsInFile = 0L
        }
        if (sortIdx >= 0) {
          val sv = sortValOf(row)
          // the declared contract: rows arrive [key, sortcol]-sorted.
          // A violated contract must REFUSE — a file written out of
          // order would still carry the sort column's zone range, and
          // the reader would prove an ordering the bytes don't have
          if (sv < lastSort) throw new IllegalStateException(
            s"clustered write received unsorted rows ($sv after $lastSort " +
              s"in _pv=$k): the engine did not honor requiredOrdering")
          lastSort = sv
        }
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
        // delete THIS attempt's files: a retried task's replacement and a
        // speculative loser must leave nothing for the driver to manifest
        created.foreach { rel =>
          val f = new java.io.File(dataDir, rel)
          if (f.exists()) f.delete()
        }
      }

      override def close(): Unit =
        if (current != null) { current.close(); current = null }
    }
}

/** The REAL DSv2 write of an identity-partitioned catalog table — the
  * value-pure twin of [[GraftBucketedBatchWrite]]. One writer serves
  * all three statement shapes; only the COMMIT differs:
  *
  *  - append (`INSERT INTO`): OCC append of the fresh value-pure files;
  *  - truncate (static `INSERT OVERWRITE`): OCC rewrite;
  *  - dynamic (`INSERT OVERWRITE`, dynamic mode): ONE OccSurgical
  *    replacing exactly the partitions the query produced rows for —
  *    and because the engine-clustered writer lands value-pure files
  *    DIRECTLY, the old scratch-then-restage shape (every row written
  *    twice) is gone: dynamic overwrite now costs one write of the
  *    replaced partitions, period.
  *
  * The dir rendering byte-matches Spark's own partitionBy form
  * ([[GraftClusterKey.renderer]]), so new files, historical files and
  * the dynamic overwrite's replace-by-value all agree. Mid-spec-
  * migration dynamic overwrites refuse (old `_pv=` segments are not
  * judgeable under the current spec).
  */
private[sources] final class GraftPartitionedBatchWrite(
    spark: SparkSession,
    store: JPath,
    partColPhys: String,
    zoneCols: Seq[String],
    tableSchema: StructType, // LOGICAL
    colMap: Map[String, String],
    partColLogical: String,
    mode: String, // append | truncate | dynamic
    info: LogicalWriteInfo,
    specFrom: Option[Int],
    morKeysPhys: Seq[String] = Nil) extends Write
    with RequiresDistributionAndOrdering {

  import org.apache.spark.sql.connector.distributions.{Distribution => V2Distribution, Distributions}
  import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder => V2SortOrder}

  override def requiredDistribution(): V2Distribution =
    Distributions.clustered(Array(Expressions.column(partColLogical)))

  override def requiredOrdering(): Array[V2SortOrder] =
    Array(Expressions.sort(Expressions.column(partColLogical),
      SortDirection.ASCENDING))

  override def requiredNumPartitions(): Int = 0 // AQE sizes the shuffle

  /** Clustering is PREFERRED, never strict: Spark then plans the write
    * shuffle as a REBALANCE on the partition column, which AQE both
    * coalesces (several small values share a task — the writer still
    * rolls one file per value) and SKEW-SPLITS (a hot value's rows
    * spread across tasks, each rolling its own file for that value).
    * Strict clustering was the r15 verdict's honest edge: one partition
    * VALUE serialized through one task, so a partition holding 80% of
    * the rows wrote on one core while the fleet idled. Value purity is
    * per FILE (the writer rolls at value boundaries within each task's
    * sorted run), so a value split across tasks stays pure — it just
    * owns a few bounded files instead of exactly one, the same trade
    * the partially-clustered SCAN makes for skewed buckets.
    */
  override def distributionStrictlyRequired(): Boolean = false

  override def description(): String =
    s"GraftPartitionedBatchWrite($store, $mode)"

  /** `writeStream.toTable` into a partitioned catalog table: the SAME
    * engine-planned clustering pipeline (streaming writes go through
    * [[org.apache.spark.sql.execution.datasources.v2.V2Writes]]'
    * prepareQuery too), with each epoch staged value-pure under its own
    * `epoch-<id>/` dir and committed by [[GraftStreamingWrite]] —
    * append, upsert-by-table-key on `morkey` tables, or whole-table
    * replace for `outputMode("complete")`. Dynamic overwrite has no
    * streaming statement shape, so it cannot reach here.
    */
  override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
    require(Option(info.options.get("branch")).isEmpty,
      "branch writes have no streaming face — epochs commit to _current " +
        "(stage a mirror table and adopt, or drop the option)")
    require(mode != "dynamic",
      s"streaming write on $store cannot run in dynamic-overwrite mode")
    val inSchema = info.schema()
    val physSchema = StructType(inSchema.fields.map(f =>
      f.copy(name = colMap.getOrElse(f.name, f.name))).toIndexedSeq)
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      spark.sessionState.newHadoopConf())
    val owFactory =
      new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat()
        .prepareWrite(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
          job, Map.empty, physSchema)
    val pIdx = inSchema.fieldNames.indexOf(partColLogical)
    require(pIdx >= 0, s"partition column '$partColLogical' missing from the " +
      s"write schema ${inSchema.fieldNames.mkString(",")}")
    val baseDir = store.resolve("data").resolve(
      "stream-" + java.util.UUID.randomUUID().toString)
    java.nio.file.Files.createDirectories(baseDir)
    val factory = new GraftEpochClusteredFactory(baseDir.toString, physSchema,
      owFactory,
      new org.apache.spark.util.SerializableConfiguration(job.getConfiguration),
      GraftIdentityKey(pIdx, inSchema.fields(pIdx).dataType), -1, None,
      spark.sessionState.conf.maxRecordsPerFile)
    val streamMode =
      if (mode == "truncate") GraftStreamComplete
      else if (morKeysPhys.nonEmpty) GraftStreamUpsert(morKeysPhys)
      else GraftStreamAppend
    new GraftStreamingWrite(spark, store, zoneCols, factory, baseDir,
      streamMode, () => GraftCatalog.seedMetaFor(store),
      autoCompact = GraftCatalog.readMarker(store)._2
        .get("autocompact").flatMap(_.toIntOption),
      autoExpire = GraftCatalog.readMarker(store)._2
        .get("autoexpire").flatMap(_.toIntOption))
  }

  override def toBatch: BatchWrite = new BatchWrite {
    private val dataDir: JPath = {
      val d = store.resolve("data").resolve(
        "occ-" + java.util.UUID.randomUUID().toString)
      java.nio.file.Files.createDirectories(d)
      d
    }

    override def createBatchWriterFactory(
        pInfo: PhysicalWriteInfo): DataWriterFactory = {
      val inSchema = info.schema()
      val physSchema = StructType(inSchema.fields.map(f =>
        f.copy(name = colMap.getOrElse(f.name, f.name))).toIndexedSeq)
      val job = org.apache.hadoop.mapreduce.Job.getInstance(
        spark.sessionState.newHadoopConf())
      val owFactory =
        new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat()
          .prepareWrite(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
            job, Map.empty, physSchema)
      val pIdx = inSchema.fieldNames.indexOf(partColLogical)
      require(pIdx >= 0, s"partition column '$partColLogical' missing from the " +
        s"write schema ${inSchema.fieldNames.mkString(",")}")
      new GraftClusteredWriterFactory(dataDir.toString, physSchema, owFactory,
        new org.apache.spark.util.SerializableConfiguration(job.getConfiguration),
        GraftIdentityKey(pIdx, inSchema.fields(pIdx).dataType), -1, None,
        spark.sessionState.conf.maxRecordsPerFile)
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val committed = GraftClusteredCommit.committedPaths(dataDir, messages)
      val fresh = Snapshots.entriesForStagedDir(spark, store, dataDir, zoneCols,
        only = Some(committed))
      if (fresh.isEmpty && mode != "truncate") {
        // nothing written: an empty append or an empty dynamic
        // overwrite replaces nothing — no-op (an empty TRUNCATE still
        // lands: it IS the truncation)
        GraftCatalog.rmTree(dataDir)
        return
      }
      // branch (WAP) target: value-pure staged files, ref-only commit.
      // Dynamic overwrite refuses — replaced-partition semantics
      // against a branch head are a contract the read path doesn't
      // carry; append or truncate the branch instead.
      Option(info.options.get("branch")) match {
        case Some(b) =>
          if (mode == "dynamic") {
            Snapshots.discardStaged(store, fresh)
            throw new UnsupportedOperationException(
              "dynamic partition overwrite has no branch face — " +
                "append to or truncate the branch")
          }
          try Snapshots.commitStagedToBranch(store, fresh, b,
            append = mode == "append")
          catch { case e: Throwable =>
            Snapshots.discardStaged(store, fresh); throw e }
          return
        case None => ()
      }
      var attempts = 0
      while (true) {
        val base = Snapshots.currentId(store)
        try {
          val seed = GraftCatalog.seedMetaFor(store)
          (mode, base) match {
            case ("append", _) | ("truncate", None) =>
              Snapshots.commitOcc(store, fresh, Snapshots.OccAppend,
                seedMeta = seed)
            case ("truncate", Some(b)) =>
              Snapshots.commitOcc(store, fresh, Snapshots.OccRewrite(b),
                seedMeta = seed)
            case ("dynamic", None) =>
              Snapshots.commitOcc(store, fresh, Snapshots.OccAppend,
                seedMeta = seed)
            case ("dynamic", Some(b)) =>
              val touched = fresh.flatMap(e =>
                Snapshots.partValueOf(e.relPath)).toSet
              val partIsTs = tableSchema.fields
                .find(f => colMap.getOrElse(f.name, f.name) == partColPhys)
                .exists(_.dataType == org.apache.spark.sql.types.TimestampType)
              val carried = Snapshots.manifest(store, b).filter { e =>
                if (!Snapshots.isDelete(e) && specFrom.exists(e.seq <= _))
                  throw new IllegalStateException(
                    s"dynamic overwrite on $store mid-spec-migration: file " +
                      s"${e.relPath} predates the current partition spec " +
                      "(compact or INSERT OVERWRITE the whole table first)")
                if (Snapshots.isDelete(e)) true // tombstones carry through
                else {
                  GraftDynamicGuards.requireJudgeablePv(store, e, partIsTs)
                  Snapshots.partValueOf(e.relPath) match {
                    case Some(v) => !touched(v)
                    case None => throw new IllegalStateException(
                      s"non-partitioned data file ${e.relPath}: dynamic " +
                        "overwrite needs a value-pure table (write through " +
                        "the partitioned catalog paths only)")
                  }
                }
              }
              Snapshots.commitOcc(store, fresh,
                Snapshots.OccSurgical(b, carried), seedMeta = seed)
            case (other, _) =>
              throw new IllegalStateException(s"unknown write mode $other")
          }
          return
        } catch {
          // fresh files are base-independent for every mode (new dirs);
          // recompute the carried set against the advanced base and retry
          case _: Snapshots.CommitConflictException if mode != "append" =>
            attempts += 1
            if (attempts >= 5) {
              Snapshots.discardStaged(store, fresh)
              throw new Snapshots.CommitConflictException(
                s"INSERT OVERWRITE on $store lost the commit race $attempts times")
            }
          case e: Throwable =>
            Snapshots.discardStaged(store, fresh)
            throw e
        }
      }
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      GraftCatalog.rmTree(dataDir)
  }
}
