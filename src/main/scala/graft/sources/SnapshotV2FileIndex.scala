package graft.sources

import java.nio.file.{Path => JPath}

import scala.collection.mutable

import graft.etl.Snapshots
import graft.etl.Snapshots.ManifestEntry
import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{PartitionDirectory, PartitioningAwareFileIndex, PartitionSpec}
import org.apache.spark.sql.types.StructType

/** The DSv2 twin of [[SnapshotFileIndex]]: the same manifest-is-the-
  * listing architecture shaped as the [[PartitioningAwareFileIndex]]
  * Spark's own `ParquetScanBuilder` requires, so the `GraftCatalog`
  * table scan reuses Spark's entire DSv2 parquet stack (vectorized
  * reader, row-group pushdown, column pruning, codegen) below a
  * manifest-planned file list. Pushed data filters prune whole files at
  * PLAN time through [[SnapshotPruning]] — the identical translation the
  * V1 path uses, so `spark.read.format(...)` and `SELECT ... FROM
  * catalog.ns.tbl` can never disagree about what a predicate skips.
  */
final class SnapshotV2FileIndex(
    spark: SparkSession,
    root: JPath,
    val snapshotId: Int,
    entries: Seq[ManifestEntry],
    userSchema: Option[StructType],
    statsCol: Option[String])
  extends PartitioningAwareFileIndex(
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
    Map.empty, userSchema) {

  require(entries.forall(e => !Snapshots.isDelete(e)),
    "SnapshotV2FileIndex lists data files only; got a tombstone entry")

  private val statuses: Seq[FileStatus] =
    entries.map(SnapshotPruning.statusOf(root, _))

  override def rootPaths: Seq[HPath] = Seq(new HPath(root.toUri))

  override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec

  override protected def leafFiles: mutable.LinkedHashMap[HPath, FileStatus] =
    mutable.LinkedHashMap(statuses.map(s => s.getPath -> s): _*)

  override protected def leafDirToChildrenFiles: Map[HPath, Array[FileStatus]] =
    statuses.groupBy(_.getPath.getParent).map { case (d, fs) => d -> fs.toArray }

  override def refresh(): Unit = () // a snapshot is immutable by contract

  /** Manifest bytes, not filesystem calls — CBO sees the true size for
    * free, so a small snapshot broadcasts.
    */
  override def sizeInBytes: Long = entries.map(_.bytes).sum

  override def inputFiles: Array[String] =
    entries.map(e => root.resolve(e.relPath).toUri.toString).toArray

  private val bloomOf = SnapshotPruning.bloomLoader(root)
  private val bloomCol = SnapshotPruning.bloomColumn(root)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val cs = dataFilters.flatMap(SnapshotPruning.constraintsOf)
    val kept = if (cs.isEmpty) entries
      else entries.filterNot(SnapshotPruning.skippable(root, _, cs, statsCol, bloomCol, bloomOf))
    Seq(PartitionDirectory(InternalRow.empty,
      kept.map(SnapshotPruning.statusWithMetadata(root, _))))
  }
}
