package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, MergeIntoTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** A table that OPTS INTO automatic MERGE schema evolution — a plain
  * `MERGE INTO` from a wider source widens it as if the statement had
  * said `WITH SCHEMA EVOLUTION`. Implemented by graft.sources.GraftTable
  * when `'mergeschema'='true'` (Delta's spark.databricks-free dial).
  */
trait AutoEvolveMergeTable {
  /** True when the table's dial ('mergeschema'='true') is set. */
  def autoEvolveMerge: Boolean
}

/** Spark 4's MERGE schema evolution is CLAUSE-driven: `MERGE WITH
  * SCHEMA EVOLUTION` evolves iff the connector declares the
  * AUTOMATIC_SCHEMA_EVOLUTION capability (the capability is a
  * permission, not a policy — `schemaEvolutionEnabled =
  * withSchemaEvolution && relation.autoSchemaEvolution`, measured from
  * the 4.1.2 bytecode). Delta's dial semantics — the table property
  * decides, every MERGE statement stays unannotated — then need exactly
  * one flip of `withSchemaEvolution` for merges whose TARGET opted in.
  *
  * The flip MUST land before the Resolution batch touches the merge:
  * star expansion and the row-level rewrite consult the flag, and an
  * injected RESOLUTION rule runs after both (measured: the
  * MergeIntoTable is already rewritten by the time extended resolution
  * rules see the plan). So this is a HINT resolution rule — the Hints
  * batch precedes Resolution — and at that point the target is still an
  * UnresolvedRelation, so the dial is read by resolving the identifier
  * through the session's catalog manager (an O(1) marker read for graft
  * tables). Everything downstream is Spark's own machinery:
  * ResolveMergeIntoSchemaEvolution computes the AddColumn changes and
  * routes them through the catalog's ALTER, a plain metadata commit — a
  * same-shape source computes zero changes and the flip is a no-op.
  */
case class AutoMergeSchemaEvolution(session: SparkSession) extends Rule[LogicalPlan] {

  private def dialOn(target: LogicalPlan): Boolean =
    EliminateSubqueryAliases(target) match {
      case r: DataSourceV2Relation => r.table match {
        case t: AutoEvolveMergeTable => t.autoEvolveMerge
        case _ => false
      }
      case u: UnresolvedRelation =>
        val parts = u.multipartIdentifier
        try {
          val cm = session.sessionState.catalogManager
          val (cat, ident) =
            if (parts.length > 1 && cm.isCatalogRegistered(parts.head))
              (cm.catalog(parts.head),
                Identifier.of(parts.tail.init.toArray, parts.last))
            else
              // Spark's own resolution for catalog-less names: a bare
              // single-part name lives in the session's CURRENT
              // namespace, not the catalog root (`USE cat.ns` must not
              // make the dial silently inert)
              (cm.currentCatalog, Identifier.of(
                if (parts.length == 1) cm.currentNamespace
                else parts.init.toArray, parts.last))
          cat match {
            // only a graft catalog can serve AutoEvolveMergeTable, and
            // its loadTable is an O(1) local marker read — never pay a
            // foreign catalog (metastore RPC) for a dial it cannot have
            case tc: TableCatalog
                if tc.getClass.getName.startsWith("graft.") =>
              tc.loadTable(ident) match {
                case a: AutoEvolveMergeTable => a.autoEvolveMerge
                case _ => false
              }
            case _ => false
          }
        } catch { case scala.util.control.NonFatal(_) => false }
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case m: MergeIntoTable if !m.withSchemaEvolution && dialOn(m.targetTable) =>
      m.copy(withSchemaEvolution = true)
  }
}
