package graft.sources

import java.nio.file.{Files => JFiles, Path => JPath}

import graft.etl.Snapshots
import graft.etl.Snapshots.ManifestEntry
import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.FileStatusWithMetadata
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
import org.apache.spark.util.sketch.BloomFilter

/** Plan-time file skipping shared by every snapshot read integration —
  * the V1 [[SnapshotFileIndex]] (HadoopFsRelation path: `spark.read
  * .format`, the `graft_snapshot`/`graft_table` TVFs) and the DSv2
  * [[SnapshotV2FileIndex]] (the `GraftCatalog` `TableCatalog`). One
  * translation from Catalyst's pushed conjuncts to manifest zone-map /
  * bloom-sidecar constraints, so the two read stacks can never disagree
  * about which files a predicate may skip.
  *
  * Skipping is conservative by the layer's standing rule: absent stats
  * / absent bloom / an unrecognized predicate shape mean "cannot skip",
  * never "skip". Pruning is an I/O optimization — Spark still applies
  * every filter row-level inside the scan, so a too-weak translation
  * costs reads, never rows.
  */
private[sources] object SnapshotPruning {

  /** One inclusive [lo, hi] constraint on a named column, or a set of
    * point keys usable against that column's bloom sidecar.
    */
  final case class Constraint(col: String, lo: Long, hi: Long,
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
  def constraintsOf(e: Expression): Seq[Constraint] = e match {
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

  /** The same translation from the V1 `sources.Filter` algebra —
    * `SupportsDelete.deleteWhere` hands filters, not expressions, and
    * the copy-on-write delete prunes its candidate files with them.
    */
  def constraintsOfFilter(f: org.apache.spark.sql.sources.Filter): Seq[Constraint] = {
    import org.apache.spark.sql.sources._
    f match {
      case And(l, r) => constraintsOfFilter(l) ++ constraintsOfFilter(r)
      case EqualTo(c, v) =>
        longOf(v).map(x => Constraint(c, x, x, Some(Seq(x)))).toSeq
      case GreaterThan(c, v) =>
        longOf(v).filter(_ < Long.MaxValue)
          .map(x => Constraint(c, x + 1, Long.MaxValue, None)).toSeq
      case GreaterThanOrEqual(c, v) =>
        longOf(v).map(x => Constraint(c, x, Long.MaxValue, None)).toSeq
      case LessThan(c, v) =>
        longOf(v).filter(_ > Long.MinValue)
          .map(x => Constraint(c, Long.MinValue, x - 1, None)).toSeq
      case LessThanOrEqual(c, v) =>
        longOf(v).map(x => Constraint(c, Long.MinValue, x, None)).toSeq
      case In(c, vs) =>
        val longs = vs.toSeq.map(longOf)
        if (longs.nonEmpty && longs.forall(_.isDefined)) {
          val ks = longs.flatten
          Seq(Constraint(c, ks.min, ks.max, Some(ks)))
        } else Nil
      case _ => Nil
    }
  }

  /** Named zone maps of one manifest entry: the `multi` tokens, plus the
    * legacy anonymous range bound to the reader-declared stats column.
    */
  def zonesOf(e: ManifestEntry, statsCol: Option[String]): Map[String, (Long, Long)] = {
    val named = e.multi.map { case (n, lo, hi) => n -> (lo, hi) }.toMap
    statsCol.flatMap(n => e.stats.map(r => n -> r)).map(named + _).getOrElse(named)
  }

  /** Can `e` be skipped given the pushed constraints? Zone maps answer
    * range constraints keyed by the constraint's column; bloom sidecars
    * answer point constraints ONLY for the store's declared bloom key
    * column (`blooms/_column`, recorded by `Snapshots.buildBlooms`) —
    * probing a k-bloom with another column's value could wrongly skip a
    * file that holds matching rows. No marker ⇒ blooms unusable.
    */
  def skippable(root: JPath, e: ManifestEntry, cs: Seq[Constraint],
                statsCol: Option[String], bloomCol: Option[String],
                bloomOf: String => Option[BloomFilter]): Boolean = {
    val zones = zonesOf(e, statsCol)
    cs.exists { c =>
      val zoneMiss = zones.get(c.col).exists { case (fLo, fHi) => c.hi < fLo || c.lo > fHi }
      val bloomMiss = bloomCol.contains(c.col) && c.points.exists { ks =>
        bloomOf(e.relPath).exists(b => !ks.exists(b.mightContainLong))
      }
      zoneMiss || bloomMiss
    }
  }

  /** The store's declared bloom key column (see `Snapshots.bloomColumn`). */
  def bloomColumn(root: JPath): Option[String] = Snapshots.bloomColumn(root)

  /** A per-index bloom-sidecar loader: sidecars load once per file per
    * index instance; `None` caches "no sidecar on disk" so absent blooms
    * cost one existence check. Concurrent-safe — one relation instance
    * can be planned from several queries at once.
    */
  def bloomLoader(root: JPath): String => Option[BloomFilter] = {
    val cache = new java.util.concurrent.ConcurrentHashMap[String, Option[BloomFilter]]()
    relPath => cache.computeIfAbsent(relPath, { rp =>
      val p = Snapshots.bloomPath(root, rp)
      if (!JFiles.exists(p)) None
      else {
        val in = JFiles.newInputStream(p)
        try Some(BloomFilter.readFrom(in)) finally in.close()
      }
    })
  }

  /** Hadoop status for a manifest entry — path + length are all the
    * scan needs; the manifest's MD5 is the layer's integrity story
    * (Snapshots.verify), not mtime.
    */
  def statusOf(root: JPath, e: ManifestEntry): FileStatus = {
    val p = new HPath(root.resolve(e.relPath).toUri)
    new FileStatus(e.bytes, false, 1, 128L * 1024 * 1024, 0L, p)
  }

  def statusWithMetadata(root: JPath, e: ManifestEntry): FileStatusWithMetadata =
    FileStatusWithMetadata(statusOf(root, e), Map.empty)
}
