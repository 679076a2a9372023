package graft.sources

import java.nio.file.{Path => JPath}

import graft.etl.Snapshots
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset => ConnectorOffset}
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** [[GraftTable]]'s ScanBuilder: delegates every pushdown negotiation to
  * Spark's own [[ParquetScanBuilder]] (Catalyst filter pushdown → the
  * [[SnapshotV2FileIndex]] zone maps + parquet row groups; column
  * pruning → the vectorized reader) and wraps the built scan so the SAME
  * relation also serves `spark.readStream.table(...)` — batch semantics
  * byte-identical to a bare ParquetScan, streaming semantics = the
  * layer's snapshot-id offsets.
  */
final class GraftScanBuilder(
    spark: SparkSession,
    store: JPath,
    snapshotId: Int,
    entries: Seq[Snapshots.ManifestEntry],
    tableSchema: StructType,
    statsCol: Option[String],
    options: CaseInsensitiveStringMap,
    colMap: Map[String, String] = Map.empty) extends ScanBuilder
    with SupportsPushDownCatalystFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  // files carry PHYSICAL column names; the scan negotiates pushdown in
  // physical terms and translates at its boundary (rows are positional,
  // so the rename itself is free — only the schemas change names)
  private val reverseMap: Map[String, String] = colMap.map(_.swap)

  private def physName(n: String): String = colMap.getOrElse(n, n)

  private def physicalize(sch: StructType): StructType =
    if (colMap.isEmpty) sch
    else StructType(sch.fields.map(f => f.copy(name = physName(f.name))).toIndexedSeq)

  private def logicalize(sch: StructType): StructType =
    if (colMap.isEmpty) sch
    else StructType(sch.fields.map(f =>
      f.copy(name = reverseMap.getOrElse(f.name, f.name))).toIndexedSeq)

  private def rename(e: Expression, m: Map[String, String]): Expression =
    if (m.isEmpty) e
    else e.transform {
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
          if m.contains(a.name) => a.withName(m(a.name))
    }

  private val physicalSchema = physicalize(tableSchema)

  private val inner: ParquetScanBuilder = ParquetScanBuilder(
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
    new SnapshotV2FileIndex(spark, store, snapshotId, entries,
      Some(physicalSchema), statsCol),
    physicalSchema, physicalSchema, options)

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    // in: logical → physical; residuals back: physical → logical (expr
    // ids are preserved by withName, so binding upstream stays intact)
    inner.pushFilters(filters.map(rename(_, colMap))).map(rename(_, reverseMap))

  override def pushedFilters(): Array[Predicate] = inner.pushedFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    inner.pruneColumns(physicalize(requiredSchema))

  // MIN/MAX/COUNT straight from parquet footers when
  // spark.sql.parquet.aggregatePushDown is on — pure delegation
  // (aggregate references arrive as logical names; skip the pushdown on
  // renamed tables rather than mistranslate)
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    colMap.isEmpty && inner.pushAggregation(agg)

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    colMap.isEmpty && inner.supportCompletePushDown(agg)

  override def build(): Scan =
    new GraftScan(spark, store, inner.build(), physicalSchema, statsCol, options,
      logicalize)
}

/** The built scan: batch path IS the wrapped [[ParquetScan]];
  * `toMicroBatchStream` turns the same table into the catalog streaming
  * source ([[SnapshotMicroBatchStream]]). Columnar support and custom
  * metrics delegate to parquet so vectorization and UI metrics stay
  * exactly Spark's.
  */
final class GraftScan(
    spark: SparkSession,
    store: JPath,
    val parquet: ParquetScan,
    tableSchema: StructType,
    statsCol: Option[String],
    options: CaseInsensitiveStringMap,
    logicalize: StructType => StructType = identity) extends Scan {

  // Spark binds the scan's output to the table's LOGICAL attributes by
  // name; the wrapped parquet scan read the PHYSICAL names — same
  // fields positionally, so only the schema is renamed, never a row
  override def readSchema(): StructType = logicalize(parquet.readSchema())

  override def toBatch: Batch = parquet.toBatch

  override def description(): String = parquet.description()

  override def supportedCustomMetrics(): Array[
      org.apache.spark.sql.connector.metric.CustomMetric] =
    parquet.supportedCustomMetrics()

  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    parquet.columnarSupportMode()

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    val start = Option(options.get("startsnapshot")).map(_.toInt).getOrElse(0)
    val skipRewrites = Option(options.get("skiprewrites")).exists(_.toBoolean)
    // the stream reads FILES, so it wants the PHYSICAL read schema; its
    // rows are positionally identical to the logical readSchema() above
    new SnapshotMicroBatchStream(spark, store, parquet.readSchema(), statsCol,
      start, skipRewrites, options)
  }
}

/** DSv2 micro-batch stream over a catalog table — the V1 snapshot
  * source's contract behind the connector API: OFFSETS ARE SNAPSHOT IDS
  * (`latestOffset` is one pointer read), a batch is the manifest diff
  * over `(from, to]` opened as an exact file list through Spark's own
  * DSv2 parquet machinery, and exactly-once composes end-to-end —
  * appends reuse files verbatim so each row appears in exactly one
  * diff, and replayed `planInputPartitions` calls over immutable
  * manifests reproduce bit-identical batches after a checkpointed
  * restart. Rewrite windows fail loudly (or are skipped whole with
  * `skiprewrites=true`), exactly like the V1 source — one shared
  * [[SnapshotDiff]] definition. Evolution replays conform: the read
  * schema is the TABLE schema, so pre-evolution files surface appended
  * columns as NULL straight from the vectorized reader.
  */
final class SnapshotMicroBatchStream(
    spark: SparkSession,
    store: JPath,
    schema: StructType,
    statsCol: Option[String],
    startExclusive: Int,
    skipRewrites: Boolean,
    options: CaseInsensitiveStringMap) extends MicroBatchStream {

  private def parse(o: ConnectorOffset): Int = o match {
    case SnapshotOffset(id) => id
    case other              => other.json.trim.toInt
  }

  private def scanOver(entries: Seq[Snapshots.ManifestEntry], at: Int): ParquetScan =
    ParquetScanBuilder(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      new SnapshotV2FileIndex(spark, store, at, entries, Some(schema), statsCol),
      schema, schema, options).build()

  override def initialOffset(): ConnectorOffset = SnapshotOffset(startExclusive)

  override def latestOffset(): ConnectorOffset =
    SnapshotOffset(Snapshots.currentId(store).filter(_ > startExclusive)
      .getOrElse(startExclusive))

  override def deserializeOffset(json: String): ConnectorOffset =
    SnapshotOffset(json.trim.toInt)

  override def planInputPartitions(start: ConnectorOffset,
                                   end: ConnectorOffset): Array[InputPartition] = {
    val from = parse(start)
    val to = parse(end)
    if (to <= from) return Array.empty
    val added = SnapshotDiff.added(store, from, to, skipRewrites)
    if (added.isEmpty) Array.empty
    else scanOver(added, to).toBatch.planInputPartitions()
  }

  /** One factory serves every micro-batch: parquet's reader factory is a
    * function of (schema, conf), not of the file list — files arrive
    * inside each FilePartition.
    */
  override def createReaderFactory(): PartitionReaderFactory =
    scanOver(Nil, startExclusive).toBatch.createReaderFactory()

  override def commit(end: ConnectorOffset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"SnapshotMicroBatchStream[$store > $startExclusive]"
}
