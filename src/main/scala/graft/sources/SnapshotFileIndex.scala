package graft.sources

import java.nio.file.{Files => JFiles, Path => JPath}



import graft.etl.Snapshots
import graft.etl.Snapshots.ManifestEntry
import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, PartitionDirectory}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StructType}
import org.apache.spark.util.sketch.BloomFilter

/** The A31 snapshot layer as a Spark [[FileIndex]] — the architecture
  * every open table format's Spark connector converges on (a custom
  * file index under Spark's own parquet scan): the MANIFEST is the
  * listing, so planning never touches the directory tree, and the
  * manifest's zone maps + bloom sidecars prune files DURING PLANNING,
  * from the very predicates Catalyst pushes into the scan.
  *
  * Division of labour, deliberately Spark-first:
  *  - this class decides WHICH files exist (pointer → manifest) and
  *    which of them the pushed data filters can exclude (named/legacy
  *    zone maps via `name=lo:hi` manifest tokens, per-file bloom
  *    sidecars for point predicates);
  *  - Spark's `ParquetFileFormat` then scans the survivors with the
  *    vectorized reader, row-group pushdown, column pruning and
  *    whole-stage codegen — none of which this layer re-implements.
  *
  * Skipping is conservative by the layer's standing rule: absent stats
  * / absent bloom mean "cannot skip", never "skip"; an unrecognized
  * predicate shape prunes nothing. Pruning is an I/O optimization —
  * Spark still applies every filter row-level, so a too-weak translation
  * costs reads, never rows. At 100 TB this is the difference between
  * a million-object listing + footer fetches and ONE tiny manifest read
  * on the driver.
  *
  * Reference behavior being served: the release tree a mirror reader
  * resolves via the reference's CURRENT symlink (Base.pm:123-144) —
  * here a reader resolves `_current` (or a pinned snapshot/ref) and
  * plans the exact file list of that release.
  */
final class SnapshotFileIndex(
    root: JPath,
    val snapshotId: Int,
    entries: Seq[ManifestEntry],
    statsCol: Option[String]) extends FileIndex {

  require(entries.forall(e => !Snapshots.isDelete(e)),
    s"SnapshotFileIndex lists data files only; got a tombstone entry")

  override val rootPaths: Seq[HPath] = Seq(new HPath(root.toUri))

  override def partitionSchema: StructType = StructType(Nil)

  /** Sizes come from the manifest, not the filesystem — CBO sees the
    * snapshot's true byte size without a single FS call, so a small
    * snapshot joins broadcast-side for free.
    */
  override def sizeInBytes: Long = entries.map(_.bytes).sum

  override def inputFiles: Array[String] =
    entries.map(e => root.resolve(e.relPath).toUri.toString).toArray

  override def refresh(): Unit = () // a snapshot is immutable by contract

  /** One inclusive [lo, hi] constraint on a named column, or a set of
    * point keys usable against that column's bloom sidecar.
    */
  private final case class Constraint(col: String, lo: Long, hi: Long,
                                      points: Option[Seq[Long]])

  private def longOf(v: Any): Option[Long] = v match {
    case l: Long    => Some(l)
    case i: Int     => Some(i.toLong)
    case s: Short   => Some(s.toLong)
    case b: Byte    => Some(b.toLong)
    case _          => None
  }

  private def litLong(e: Expression): Option[Long] = e match {
    case Literal(v, ByteType | ShortType | IntegerType | LongType) => longOf(v)
    case _ => None
  }

  /** Translate one pushed conjunct into zone/bloom constraints. Unknown
    * shapes translate to Nil — no pruning, full correctness (the filter
    * still runs row-level inside the scan).
    */
  private def constraintsOf(e: Expression): Seq[Constraint] = e match {
    case And(l, r) => constraintsOf(l) ++ constraintsOf(r)
    case EqualTo(a: Attribute, v) =>
      litLong(v).map(x => Constraint(a.name, x, x, Some(Seq(x)))).toSeq
    case EqualTo(v, a: Attribute) =>
      litLong(v).map(x => Constraint(a.name, x, x, Some(Seq(x)))).toSeq
    case GreaterThan(a: Attribute, v) =>
      litLong(v).filter(_ < Long.MaxValue)
        .map(x => Constraint(a.name, x + 1, Long.MaxValue, None)).toSeq
    case GreaterThanOrEqual(a: Attribute, v) =>
      litLong(v).map(x => Constraint(a.name, x, Long.MaxValue, None)).toSeq
    case LessThan(a: Attribute, v) =>
      litLong(v).filter(_ > Long.MinValue)
        .map(x => Constraint(a.name, Long.MinValue, x - 1, None)).toSeq
    case LessThanOrEqual(a: Attribute, v) =>
      litLong(v).map(x => Constraint(a.name, Long.MinValue, x, None)).toSeq
    case GreaterThan(v, a: Attribute) => constraintsOf(LessThan(a, v))
    case GreaterThanOrEqual(v, a: Attribute) => constraintsOf(LessThanOrEqual(a, v))
    case LessThan(v, a: Attribute) => constraintsOf(GreaterThan(a, v))
    case LessThanOrEqual(v, a: Attribute) => constraintsOf(GreaterThanOrEqual(a, v))
    case In(a: Attribute, vs) =>
      val longs = vs.map(litLong)
      if (longs.nonEmpty && longs.forall(_.isDefined)) {
        val ks = longs.flatten
        Seq(Constraint(a.name, ks.min, ks.max, Some(ks)))
      } else Nil
    case InSet(a: Attribute, vs) =>
      val longs = vs.toSeq.map(longOf)
      if (longs.nonEmpty && longs.forall(_.isDefined)) {
        val ks = longs.flatten
        Seq(Constraint(a.name, ks.min, ks.max, Some(ks)))
      } else Nil
    case IsNotNull(_) => Nil
    case _ => Nil
  }

  /** Named zone maps of one manifest entry: the `multi` tokens, plus the
    * legacy anonymous range bound to the reader-declared stats column.
    */
  private def zonesOf(e: ManifestEntry): Map[String, (Long, Long)] = {
    val named = e.multi.map { case (n, lo, hi) => n -> (lo, hi) }.toMap
    statsCol.flatMap(n => e.stats.map(r => n -> r)).map(named + _).getOrElse(named)
  }

  // bloom sidecars load once per file per index instance; `None` caches
  // "no sidecar on disk" so absent blooms cost one existence check.
  // Concurrent-safe: one relation instance can be planned from several
  // queries at once (a cached DataFrame shared across threads)
  private val bloomCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[BloomFilter]]()

  private def bloomOf(relPath: String): Option[BloomFilter] =
    bloomCache.computeIfAbsent(relPath, { rp =>
      val p = Snapshots.bloomPath(root, rp)
      if (!JFiles.exists(p)) None
      else {
        val in = JFiles.newInputStream(p)
        try Some(BloomFilter.readFrom(in)) finally in.close()
      }
    })

  /** Can `e` be skipped given the pushed constraints? Zone maps answer
    * range constraints; bloom sidecars answer point constraints (their
    * column membership is keyed by sidecar existence — a bloom sidecar
    * is built for one declared key column per layer contract).
    */
  private def skippable(e: ManifestEntry, cs: Seq[Constraint]): Boolean = {
    val zones = zonesOf(e)
    cs.exists { c =>
      val zoneMiss = zones.get(c.col).exists { case (fLo, fHi) => c.hi < fLo || c.lo > fHi }
      val bloomMiss = c.points.exists { ks =>
        bloomOf(e.relPath).exists(b => !ks.exists(b.mightContainLong))
      }
      zoneMiss || bloomMiss
    }
  }

  private def statusOf(e: ManifestEntry): FileStatusWithMetadata = {
    val p = new HPath(root.resolve(e.relPath).toUri)
    // mtime 0: the scan needs only path + length; the manifest's MD5 is
    // the layer's integrity story (Snapshots.verify), not mtime
    FileStatusWithMetadata(
      new FileStatus(e.bytes, false, 1, 128L * 1024 * 1024, 0L, p), Map.empty)
  }

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val cs = dataFilters.flatMap(constraintsOf)
    val kept = if (cs.isEmpty) entries else entries.filterNot(skippable(_, cs))
    Seq(PartitionDirectory(InternalRow.empty, kept.map(statusOf)))
  }
}
