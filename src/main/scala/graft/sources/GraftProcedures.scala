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
            case _ =>
              Snapshots.compactOcc(s, store, in.getInt(1), statsCol)
          }
        Seq(Row(id, conflicts))
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
