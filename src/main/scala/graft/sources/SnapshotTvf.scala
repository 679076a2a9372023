package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** `FROM graft_snapshot('/store' [, snapshot_id | 'ref'])` — the
  * snapshot layer as a SQL table-valued function, registered by
  * [[graft.GraftExtensions]] via `injectTableFunction`. A pure-SQL
  * user (JDBC gateway, notebook SQL cell) gets the exact relation the
  * DataFrame source builds: manifest listing, plan-time zone-map/bloom
  * skipping, snapshot pinning — no Scala API required. An INTEGER
  * second argument pins a snapshot id (time travel); a STRING second
  * argument names a branch/tag ref.
  */
object SnapshotTvf {

  private def argValue(e: Expression, what: String): Any = e match {
    case l: Literal            => l.value
    case f if f.foldable       => f.eval()
    case other => throw new IllegalArgumentException(
      s"graft_snapshot: $what must be a literal, got $other")
  }

  def build(es: Seq[Expression]): LogicalPlan = {
    require(es.nonEmpty && es.size <= 2,
      "usage: graft_snapshot(path[, snapshot_id | ref_name])")
    val path = String.valueOf(argValue(es.head, "path"))
    val pin: Map[String, String] =
      if (es.size < 2) Map.empty
      else argValue(es(1), "snapshot pin") match {
        case n: Int  => Map("snapshot" -> n.toString)
        case n: Long => Map("snapshot" -> n.toString)
        case s       => Map("ref" -> String.valueOf(s))
      }
    val spark = SparkSession.active
    val rel = new SnapshotSource().createRelation(
      spark.sqlContext, Map("path" -> path) ++ pin)
    LogicalRelation(rel)
  }

  /** `FROM graft_table('/catalog', 'table'[, version])` — a table of an
    * A32 [[graft.etl.TxnCatalog]] at a catalog VERSION, from pure SQL.
    * Two `graft_table` references pinned to the same version are
    * CROSS-TABLE CONSISTENT by the catalog's one-rename commit: a SQL
    * join/union over them can never observe half of a multi-table
    * transaction. Resolves through the layer's own read (tombstones
    * applied seq-aware), so delete-carrying tables read exactly;
    * default version = the catalog's current.
    */
  def buildTable(es: Seq[Expression]): LogicalPlan = {
    require(es.size == 2 || es.size == 3,
      "usage: graft_table(catalog_path, table_name[, version])")
    val cat = java.nio.file.Paths.get(String.valueOf(argValue(es.head, "catalog path")))
    val table = String.valueOf(argValue(es(1), "table name"))
    val v =
      if (es.size < 3) graft.etl.TxnCatalog.version(cat).getOrElse(
        throw new IllegalStateException(s"no committed catalog version under $cat"))
      else argValue(es(2), "version") match {
        case n: Int  => n
        case n: Long => n.toInt
        case other => throw new IllegalArgumentException(
          s"graft_table: version must be an integer, got $other")
      }
    val spark = SparkSession.active
    graft.etl.TxnCatalog.readTableAt(spark, cat, table, v).queryExecution.logical
  }
}
