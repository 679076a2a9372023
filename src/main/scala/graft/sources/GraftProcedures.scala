package graft.sources

import java.nio.file.{Path => JPath}

import graft.etl.Snapshots
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/** The catalog's maintenance surface as SQL `CALL` procedures — the
  * operations a table owner runs BETWEEN queries (compaction, retention,
  * refs, layout), which until now needed the Scala API:
  *
  * {{{
  *   CALL cat.system.compact(tbl => 'ns.t', target_files => 8)
  *   CALL cat.system.compact_partitions(tbl => 'ns.t', min_files => 4)
  *   CALL cat.system.zorder(tbl => 'ns.t', target_files => 16,
  *                          c1 => 'k', c2 => 'g')
  *   CALL cat.system.expire(tbl => 'ns.t', keep_from => 5)
  *   CALL cat.system.create_tag(tbl => 'ns.t', name => 'v1', snapshot_id => 3)
  *   CALL cat.system.create_branch(tbl => 'ns.t', name => 'audit', snapshot_id => 3)
  *   CALL cat.system.adopt_branch(tbl => 'ns.t', name => 'audit')
  *   CALL cat.system.drop_ref(tbl => 'ns.t', name => 'audit')
  *   CALL cat.system.rollback(tbl => 'ns.t', snapshot_id => 2)
  *   CALL cat.system.build_blooms(tbl => 'ns.t', key_col => 'k')
  * }}}
  *
  * Every procedure delegates to the layer's own kernel (compactOcc /
  * compactZOrder / expire / refs / buildBlooms) — the catalog adds
  * argument binding and a result relation, never a second maintenance
  * path. Results come back as one-row relations (snapshot ids, counts)
  * so a CALL's outcome is inspectable from SQL.
  */
private[sources] object GraftProcedures {

  /** (name, parameters, output schema, body). The body receives the
    * bound input row and the resolved store path of the `tbl` argument.
    */
  private final case class Spec(
      name: String,
      params: Seq[ProcedureParameter],
      out: StructType,
      body: (SparkSession, JPath, InternalRow) => Seq[Row])

  private def p(n: String, t: DataType): ProcedureParameter =
    ProcedureParameter.in(n, t).build()
  private def pDefault(n: String, t: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(n, t).defaultValue(default).build()

  private def str(r: InternalRow, i: Int): String = r.getUTF8String(i).toString

  private val specs: Seq[Spec] = Seq(
    Spec("compact",
      Seq(p("tbl", StringType), p("target_files", IntegerType),
        pDefault("statscol", StringType, "NULL")),
      StructType(Seq(StructField("snapshot_id", IntegerType),
        StructField("conflicts_survived", IntegerType))),
      (s, store, in) => {
        // default = the table's durable 'statscol' property: omitting
        // the redundant argument must not silently strip zone maps
        val props = GraftCatalog.readMarker(store)._2
        val statsCol =
          if (in.isNullAt(2)) props.get("statscol")
          else Some(str(in, 2))
        // BUCKETED tables compact bucket-aware: the rewrite re-stages
        // through the bucketed (and, with 'sortcol', sorted) writer, so
        // compaction FOLDS each bucket to one file and RESTORES the
        // ordering claim that overlapping appends declined — a generic
        // compact would de-bucket the layout and silently forfeit the
        // storage-partitioned join until the next overwrite.
        val (id, conflicts) =
          (props.get("bucketcol"), props.get("bucketn").flatMap(_.toIntOption)) match {
            case (Some(c), Some(nb)) =>
              // bucketed compact folds to ONE file per bucket — the
              // layout, not target_files, dictates the file count; say
              // so instead of silently ignoring the argument
              if (in.getInt(1) != nb)
                org.slf4j.LoggerFactory.getLogger(GraftProcedures.getClass)
                  .warn(s"compact: table is bucketed (n=$nb); " +
                    s"target_files=${in.getInt(1)} is ignored — bucketed " +
                    "compaction folds each bucket to one file")
              val sortC = props.get("sortcol")
              Snapshots.rewriteOcc(s, store) { baseDf =>
                Snapshots.stageOccBucketed(s, store, baseDf, c, nb,
                  (statsCol.toSeq ++ sortC.toSeq).distinct, sortC, cluster = true)
              }
            case _ => props.get("partitioncol") match {
              case Some(pc) =>
                // IDENTITY-partitioned tables compact VALUE-PURE, for
                // the same reason bucketed ones compact bucket-aware: a
                // generic compact would strip the _pv= layout and
                // silently forfeit partition pruning, SPJ and dynamic
                // overwrite until the next full overwrite. One task per
                // value folds each partition to ~one file (rolled at
                // maxRecordsPerFile); target_files is the layout's call
                // here, not the argument's.
                Snapshots.rewriteOcc(s, store) { baseDf =>
                  import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
                  val integral = baseDf.schema.fields.find(_.name == pc)
                    .map(_.dataType).exists {
                      case LongType | IntegerType | ShortType | ByteType => true
                      case _ => false
                    }
                  val zone = (statsCol.toSeq ++ (if (integral) Seq(pc) else Nil)).distinct
                  Snapshots.stageOccPartitioned(s, store,
                    baseDf.repartition(org.apache.spark.sql.functions.col(pc)), pc, zone)
                }
              case None =>
                Snapshots.compactOcc(s, store, in.getInt(1), statsCol)
            }
          }
        Seq(Row(id, conflicts))
      }),
    Spec("compact_partitions",
      Seq(p("tbl", StringType), pDefault("min_files", IntegerType, "4")),
      StructType(Seq(StructField("rewritten_partitions", IntegerType),
        StructField("files_before", IntegerType),
        StructField("files_after", IntegerType),
        StructField("snapshot_id", IntegerType))),
      (s, store, in) => {
        // SELECTIVE small-file compaction — the maintenance pass a
        // streaming sink needs: per-epoch commits fragment the hot
        // partitions, and at scale a whole-table rewrite to fix one
        // partition's fragmentation is a non-starter. Rewrites ONLY the
        // partition values holding more than `min_files` files (each
        // folded value-pure, one task per value) and carries every
        // other file BYTE-IDENTICAL through one OccSurgical commit —
        // I/O is O(fragmented partitions), never the table.
        val minFiles = in.getInt(1)
        val (parts, fb, fa, id) =
          GraftMaintenance.compactPartitions(s, store, minFiles)
        Seq(Row(parts, fb, fa, id))
      }),
    Spec("zorder",
      Seq(p("tbl", StringType), p("target_files", IntegerType),
        p("c1", StringType), p("c2", StringType)),
      StructType(Seq(StructField("snapshot_id", IntegerType),
        StructField("conflicts_survived", IntegerType))),
      (s, store, in) => {
        val (id, conflicts) = Snapshots.compactZOrder(
          s, store, in.getInt(1), str(in, 2), str(in, 3))
        Seq(Row(id, conflicts))
      }),
    Spec("expire",
      Seq(p("tbl", StringType), p("keep_from", IntegerType)),
      StructType(Seq(StructField("expired_manifests", IntegerType),
        StructField("deleted_bytes", LongType))),
      (s, store, in) => {
        val (n, bytes) = Snapshots.expire(store, in.getInt(1))
        Seq(Row(n, bytes))
      }),
    Spec("add_files",
      Seq(p("tbl", StringType), p("src", StringType),
        pDefault("statscol", StringType, "NULL")),
      StructType(Seq(StructField("added_files", IntegerType),
        StructField("added_bytes", LongType), StructField("snapshot_id", IntegerType))),
      (s, store, in) => {
        val src = java.nio.file.Paths.get(str(in, 1))
        val (declared, props) = GraftCatalog.readMarker(store)
        require(!props.contains("partitioncol"),
          "add_files does not compose with PARTITIONED BY: adopted files " +
            "cannot prove value-purity for the _pv= layout")
        require(!props.keys.exists(_.startsWith("colmap.")),
          "add_files on a renamed-column table is ambiguous (adopted " +
            "footers carry physical names); compact or rewrite instead")
        // footer shape must equal the DECLARED shape exactly — a
        // silently adopted schema drift would poison every later read
        val incoming = s.read.parquet(src.toString).schema
        val shape: org.apache.spark.sql.types.StructType => Seq[(String, String)] =
          st => st.fields.toSeq.map(f => (f.name, f.dataType.sql))
        require(shape(incoming) == shape(declared),
          s"adopted files' schema ${incoming.simpleString} does not match " +
            s"the declared ${declared.simpleString}")
        val statsCol =
          if (in.isNullAt(2)) props.get("statscol") else Some(str(in, 2))
        val (nf, nb, id) = Snapshots.adoptFiles(s, store, src, statsCol)
        Seq(Row(nf, nb, id))
      }),
    Spec("remove_orphans",
      Seq(p("tbl", StringType), p("older_than_ms", LongType)),
      StructType(Seq(StructField("removed_files", IntegerType),
        StructField("removed_bytes", LongType))),
      (s, store, in) => {
        val (n, bytes) = Snapshots.removeOrphans(store, in.getLong(1))
        Seq(Row(n, bytes))
      }),
    Spec("expire_older",
      Seq(p("tbl", StringType), p("older_than_ms", LongType)),
      StructType(Seq(StructField("expired_manifests", IntegerType),
        StructField("deleted_bytes", LongType))),
      (s, store, in) => {
        val (n, bytes) = Snapshots.expireOlderThan(store, in.getLong(1))
        Seq(Row(n, bytes))
      }),
    Spec("register_consumer",
      Seq(p("tbl", StringType), p("name", StringType), p("offset", IntegerType)),
      StructType(Seq(StructField("offset", IntegerType))),
      (s, store, in) => {
        // an EXTERNAL consumer (a foreachBatch pipeline, a downstream
        // job tracking readChanges offsets) claims the same retention
        // floor a `.option("consumer", ...)` stream registers; offsets
        // are monotone, so replaying an old batch never lowers it
        Snapshots.registerConsumer(store, str(in, 1), in.getInt(2))
        Seq(Row(in.getInt(2)))
      }),
    Spec("unregister_consumer",
      Seq(p("tbl", StringType), p("name", StringType)),
      StructType(Seq(StructField("removed", org.apache.spark.sql.types.BooleanType))),
      (s, store, in) =>
        Seq(Row(Snapshots.unregisterConsumer(store, str(in, 1))))),
    Spec("create_tag",
      Seq(p("tbl", StringType), p("name", StringType), p("snapshot_id", IntegerType)),
      StructType(Seq(StructField("tagged", IntegerType))),
      (s, store, in) => {
        Snapshots.createTag(store, str(in, 1), in.getInt(2)); Seq(Row(in.getInt(2)))
      }),
    Spec("create_branch",
      Seq(p("tbl", StringType), p("name", StringType), p("snapshot_id", IntegerType)),
      StructType(Seq(StructField("branched", IntegerType))),
      (s, store, in) => {
        Snapshots.createBranch(store, str(in, 1), in.getInt(2)); Seq(Row(in.getInt(2)))
      }),
    Spec("adopt_branch",
      Seq(p("tbl", StringType), p("name", StringType)),
      StructType(Seq(StructField("snapshot_id", IntegerType))),
      (s, store, in) => Seq(Row(Snapshots.adoptBranch(store, str(in, 1))))),
    Spec("drop_ref",
      Seq(p("tbl", StringType), p("name", StringType)),
      StructType(Seq(StructField("dropped", BooleanType))),
      (s, store, in) => Seq(Row(Snapshots.dropRef(store, str(in, 1))))),
    Spec("rollback",
      Seq(p("tbl", StringType), p("snapshot_id", IntegerType)),
      StructType(Seq(StructField("current", IntegerType))),
      (s, store, in) => Seq(Row(Snapshots.rollback(store, in.getInt(1))))),
    Spec("clone",
      Seq(p("tbl", StringType), p("dst", StringType),
        pDefault("snapshot_id", IntegerType, "NULL")),
      StructType(Seq(StructField("cloned_files", IntegerType),
        StructField("copied_tombstones", IntegerType))),
      (s, store, in) => {
        // zero-copy SHALLOW CLONE into a sibling table of the same
        // namespace (the manifest references are sibling-relative, so
        // the destination must live beside the source). The marker is
        // the source's EFFECTIVE shape at the cloned snapshot — an
        // older snapshot clones with its own schema, not today's.
        val dstName = str(in, 1)
        require(!dstName.contains('.') && !dstName.contains('/') &&
          dstName.nonEmpty && dstName != store.getFileName.toString,
          s"clone destination '$dstName' must be a bare sibling table name")
        val dstDir = store.getParent.resolve(dstName)
        require(!java.nio.file.Files.exists(dstDir),
          s"clone destination '$dstName' already exists")
        val atId = if (in.isNullAt(2)) Snapshots.currentId(store).getOrElse(
          throw new IllegalStateException(s"no published snapshot under $store"))
        else in.getInt(2)
        val (sch, props) = GraftCatalog.effectiveMarker(store, Some(atId))
        val (files, tombs) = Snapshots.cloneSnapshot(store, dstDir, atId)
        GraftCatalog.writeMarker(dstDir, sch, props)
        Seq(Row(files, tombs))
      }),
    Spec("analyze",
      Seq(p("tbl", StringType), p("cols", StringType),
        pDefault("mode", StringType, "'exact'")),
      StructType(Seq(StructField("column", StringType),
        StructField("ndv", LongType), StructField("nulls", LongType))),
      (s, store, in) => {
        // per-column NDV + null counts, persisted as a stats sidecar
        // the scan's reported column statistics serve to Spark's CBO
        // (see GraftScan) — the ANALYZE TABLE of this catalog. Columns
        // arrive logical, comma-separated; sidecars store physical.
        // mode='exact' (default): one job over the merged view.
        // mode='sketch': incremental per-file KMV — a re-analyze after
        // an append scans only the NEW files (see analyzeSketch).
        val cur = Snapshots.currentId(store).getOrElse(
          throw new IllegalStateException(s"no published snapshot under $store"))
        val props = GraftCatalog.readMarker(store)._2
        val logicals = str(in, 1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
        require(logicals.nonEmpty, "analyze: no columns named")
        val phys = logicals.map(l => props.getOrElse("colmap." + l, l))
        val res = str(in, 2) match {
          case "exact"  => Snapshots.analyzeColumns(s, store, cur, phys)
          case "sketch" => Snapshots.analyzeSketch(s, store, cur, phys)
          case other => throw new IllegalArgumentException(
            s"analyze: unknown mode '$other' (use 'exact' or 'sketch')")
        }
        logicals.zip(res).map { case (l, (_, d, u)) => Row(l, d, u) }
      }),
    Spec("build_blooms",
      Seq(p("tbl", StringType), p("key_col", StringType),
        pDefault("est_items", LongType, "262144")),
      StructType(Seq(StructField("built", IntegerType))),
      (s, store, in) => {
        val cur = Snapshots.currentId(store).getOrElse(
          throw new IllegalStateException(s"no published snapshot under $store"))
        Seq(Row(Snapshots.buildBlooms(s, store, cur, str(in, 1),
          estItems = in.getLong(2))))
      }))

  val names: Seq[String] = specs.map(_.name)

  def load(name: String, resolveTable: String => JPath): UnboundProcedure =
    specs.find(_.name.equalsIgnoreCase(name)).map(sp =>
      new GraftProcedure(sp.name, sp.params.toArray, sp.out, sp.body, resolveTable))
      .getOrElse(throw new IllegalArgumentException(
        s"no procedure named '$name'; available: ${names.mkString(", ")}"))

  private final class GraftProcedure(
      procName: String,
      params: Array[ProcedureParameter],
      out: StructType,
      body: (SparkSession, JPath, InternalRow) => Seq[Row],
      resolveTable: String => JPath) extends UnboundProcedure with BoundProcedure {

    override def name(): String = procName
    override def description(): String = s"graft maintenance procedure $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val store = resolveTable(str(input, 0))
      val rows = body(spark, store, input)
      // driver-local conversion: a LocalScan exists precisely so a
      // handful of result rows never costs a Spark job
      val toCatalyst = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToCatalystConverter(out)
      val converted = rows.map(r => toCatalyst(r).asInstanceOf[InternalRow]).toArray
      val scan: Scan = new LocalScan {
        override def rows(): Array[InternalRow] = converted
        override def readSchema(): StructType = out
        override def description(): String = s"GraftProcedure($procName)"
      }
      java.util.List.of(scan).iterator()
    }
  }
}

/** The selective small-file compaction kernel, shared by the
  * `compact_partitions` procedure and the streaming sink's
  * `'autocompact'` dial ([[GraftStreamingWrite]]). Rewrites ONLY the
  * partition values (identity `_pv=` values or bucket ids) holding more
  * than `minFiles` files — each folded in the table's OWN layout (the
  * sorted bucketed stager restores ordering claims) — and carries every
  * other file BYTE-IDENTICAL through one [[Snapshots.OccSurgical]]
  * commit. I/O is O(fragmented partitions), never the table.
  *
  * Live tombstones and non-value-pure files throw when `lenient=false`
  * (the CALL surface: a user asked and must hear why nothing happened);
  * with `lenient=true` (the in-sink auto pass: maintenance must never
  * fail ingestion) they return a no-op result instead.
  *
  * Returns (rewritten partitions, files before, files after, snapshot).
  */
private[sources] object GraftMaintenance {
  def compactPartitions(s: SparkSession, store: JPath, minFiles: Int,
                        lenient: Boolean = false): (Int, Int, Int, Int) = {
    val props = GraftCatalog.readMarker(store)._2
    val pcOpt = props.get("partitioncol")
    val bucketOpt = (props.get("bucketcol"),
      props.get("bucketn").flatMap(_.toIntOption)) match {
      case (Some(c), Some(nb)) => Some((c, nb))
      case _                   => None
    }
    if (pcOpt.isEmpty && bucketOpt.isEmpty) throw new IllegalArgumentException(
      "compact_partitions needs a PARTITIONED BY table (identity or " +
        "bucket transform); flat tables compact whole (CALL system.compact)")
    require(minFiles >= 2, s"min_files must be >= 2, got $minFiles")
    val statsCol = props.get("statscol")
    val sortC = props.get("sortcol")
    var attempts = 0
    var out: (Int, Int, Int, Int) = null
    while (out == null) {
      val base = Snapshots.currentId(store).getOrElse(
        throw new IllegalStateException(s"no published snapshot under $store"))
      val entries = Snapshots.manifest(store, base)
      // live tombstones make "this partition's rows" a table-wide
      // question (equality keys erase across files); the selective
      // carry below would need the merged view's provenance. The full
      // bucket-aware/partitioned compact folds tombstones — run it
      // first; this pass is for APPEND fragmentation.
      if (entries.exists(Snapshots.isDelete)) {
        if (lenient) return (0, entries.size, entries.size, base)
        throw new IllegalStateException(
          s"$store carries live tombstones: fold them first " +
            "(CALL system.compact), then compact_partitions")
      }
      val byVal = entries.groupBy(e => Snapshots.partValueOf(e.relPath))
      if (byVal.contains(None)) {
        if (lenient) return (0, entries.size, entries.size, base)
        throw new IllegalStateException(
          s"$store holds non-value-pure data files: selective partition " +
            "compaction cannot attribute them; run a full compact")
      }
      val frag: Map[String, Seq[Snapshots.ManifestEntry]] =
        byVal.collect { case (Some(v), es) if es.size > minFiles => v -> es }
      if (frag.isEmpty) {
        out = (0, entries.size, entries.size, base)
      } else {
        val fragSet = frag.values.flatten.map(_.relPath).toSet
        val carried = entries.filterNot(e => fragSet(e.relPath))
        // exact file-list read of JUST the fragmented partitions;
        // mergeSchema conforms across evolution, like every rewrite
        val df = s.read.option("mergeSchema", "true").parquet(
          fragSet.toSeq.sorted.map(r => store.resolve(r).toString): _*)
        val before = df.count()
        // re-stage the fragmented values in the table's OWN layout:
        // identity values fold value-pure; BUCKET ids fold through the
        // bucketed (and, with 'sortcol', sorted) stager, so the
        // rewritten buckets come back one-file-each with their ordering
        // claim restored — rows land under the CURRENT spec (new seq),
        // exactly like the full bucket-aware compact
        val fresh = (pcOpt, bucketOpt) match {
          case (Some(pc), _) =>
            import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
            val integral = df.schema.fields.find(_.name == pc)
              .map(_.dataType).exists {
                case LongType | IntegerType | ShortType | ByteType => true
                case _ => false
              }
            val zone = (statsCol.toSeq ++ (if (integral) Seq(pc) else Nil)).distinct
            Snapshots.stageOccPartitioned(s, store,
              df.repartition(org.apache.spark.sql.functions.col(pc)), pc, zone)
          case (None, Some((c, nb))) =>
            Snapshots.stageOccBucketed(s, store, df, c, nb,
              (statsCol.toSeq ++ sortC.toSeq).distinct, sortC, cluster = true)
          case _ => throw new IllegalStateException("unreachable: layout checked above")
        }
        // parity gate before the commit, like rewriteOcc's: a rewrite
        // that changed the row count must never land
        val after = s.read.option("mergeSchema", "true").parquet(
          fresh.map(e => store.resolve(e.relPath).toString): _*).count()
        if (after != before) {
          Snapshots.discardStaged(store, fresh)
          throw new IllegalStateException(
            s"selective compaction row-count mismatch: $before read, $after staged")
        }
        try {
          val id = Snapshots.commitOcc(store, fresh,
            Snapshots.OccSurgical(base, carried))
          out = (frag.size, entries.size, carried.size + fresh.size, id)
        } catch {
          case _: Snapshots.CommitConflictException =>
            Snapshots.discardStaged(store, fresh)
            attempts += 1
            if (attempts >= 5) throw new Snapshots.CommitConflictException(
              s"compact_partitions on $store lost the commit race $attempts times")
          // recompute the fragmentation map against the new base
        }
      }
    }
    out
  }
}
