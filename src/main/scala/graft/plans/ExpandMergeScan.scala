package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, Cast, KnownNotNull, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** A DSv2 [[org.apache.spark.sql.connector.catalog.Table]] that may be
  * serving a MERGED (tombstone-aware) view and can hand the optimizer
  * that view as a full logical plan. Implemented by
  * graft.sources.GraftTable: when the current snapshot of a `morkey`
  * table carries equality-delete tombstones, the true read IS a
  * relational plan — vectorized parquet scans of the data files,
  * anti-joined per sequence group against the tombstone keys — so the
  * fastest execution is to let Catalyst see that plan rather than hide
  * it behind the V1 row bridge the scan builder would otherwise use.
  */
trait ExpandableMergeTable {
  /** `Some(plan)` iff the table's served snapshot is tombstone-bearing:
    * the merged read as an ANALYZED logical plan. `None` → the table
    * reads as a plain file scan and needs no expansion.
    */
  def mergedPlanIfServed(): Option[LogicalPlan]
}

/** Splices the merged plan of a tombstone-bearing snapshot read into the
  * query tree, restoring the whole vectorized read stack that the V1
  * bridge forfeits.
  *
  * Runs in the operator-optimization (fixed point) batch, which is
  * BEFORE V2ScanRelationPushDown ("Early Filter and Projection
  * Push-Down" comes after the operator batch) — so the match target is
  * the pre-pushdown [[DataSourceV2Relation]]. After the splice the SAME
  * batch's PushDownPredicates / ColumnPruning push the query's filters
  * and projections through the union and the anti-joins' left sides
  * down to the parquet relations, where FileSourceStrategy turns them
  * into real PushedFilters — predicate pushdown, column pruning,
  * vectorized decoding and whole-stage codegen all come back for free.
  *
  * Output identity is preserved exactly: each relation output attribute
  * is re-bound by name onto the merged plan under its original exprId;
  * a column the old files lack (schema evolution) conforms as a typed
  * null, and a NOT NULL table column (the morkey) keeps its
  * non-nullability via [[KnownNotNull]]. Row-level DML source scans are
  * untouched (their relation carries a RowLevelOperationTable, not the
  * GraftTable itself) and fall back to the V1 bridge, as does any
  * session without GraftExtensions.
  *
  * At 100 TB this is the difference between a read-hot MoR table paying
  * 2.3x on every read between compactions (r13's measured bridge price)
  * and paying only the anti-join itself.
  */
case class ExpandMergeScan(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case r: DataSourceV2Relation if r.table.isInstanceOf[ExpandableMergeTable] =>
      r.table.asInstanceOf[ExpandableMergeTable].mergedPlanIfServed() match {
        case None => r
        case Some(merged) => ExpandMergeScan.conformTo(r.output, merged)
      }
  }
}

object ExpandMergeScan {
  /** The conform projection rebinding `merged` onto `output` exactly:
    * by (case-insensitive) name under the original exprIds, cast where
    * the types differ, a missing column as a typed null (schema
    * evolution), declared non-nullability via [[KnownNotNull]].
    */
  private[plans] def conformExprs(output: Seq[Attribute],
                                  merged: LogicalPlan): Seq[NamedExpression] = {
    val byName = merged.output.map(a => a.name.toLowerCase -> a).toMap
    output.map { a =>
      byName.get(a.name.toLowerCase) match {
        case Some(c) =>
          val typed = if (c.dataType == a.dataType) c else Cast(c, a.dataType)
          val shaped =
            if (!a.nullable && typed.nullable) KnownNotNull(typed) else typed
          Alias(shaped, a.name)(exprId = a.exprId)
        case None =>
          Alias(Cast(Literal(null), a.dataType), a.name)(exprId = a.exprId)
      }
    }
  }

  private[plans] def conformTo(output: Seq[Attribute],
                               merged: LogicalPlan): Project =
    Project(conformExprs(output, merged), merged)
}

/** A DSv2 Scan (the pair-bearing GROUP rewrite scan) that hands the
  * planner its merged logical plan. The handed plan must arrive fully
  * OPTIMIZED: the expansion happens at PHYSICAL planning
  * ([[ExpandMergedGroupScanStrategy]]), after every optimizer batch.
  */
trait ExpandableGroupScan {
  def mergedPlan(): LogicalPlan
}

/** The physical-planning twin of [[ExpandMergeScan]] for row-level
  * (ReplaceData) rewrite scans over pair-bearing tables: the group scan
  * planning rule builds scan relations AFTER every injectable optimizer
  * batch ("Pre CBO Rules" precedes "Early Filter and Projection
  * Push-Down"), so the expansion runs as a PLANNER STRATEGY — physical
  * planning always sees the post-pushdown relation. The strategy plans
  * the conform projection over `planLater(mergedPlan)`, splicing the
  * kept-files-minus-dead-coordinates read so UPDATE / MERGE / complex
  * DELETE on a position-delete table execute without resurrecting
  * deleted rows.
  */
object ExpandMergedGroupScanStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
    plan match {
      // match the whole PhysicalOperation, not the bare relation:
      // DataSourceV2Strategy consumes Project/Filter + relation as a
      // unit, so a bare-relation case would never fire first
      case org.apache.spark.sql.catalyst.planning.PhysicalOperation(project, filters,
          r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation)
          if r.scan.isInstanceOf[ExpandableGroupScan] =>
        val merged = r.scan.asInstanceOf[ExpandableGroupScan].mergedPlan()
        val base: org.apache.spark.sql.execution.SparkPlan =
          planLater(ExpandMergeScan.conformTo(r.output, merged))
        val filtered = filters.reduceOption(And)
          .map(org.apache.spark.sql.execution.FilterExec(_, base)).getOrElse(base)
        org.apache.spark.sql.execution.ProjectExec(project, filtered) :: Nil
      case _ => Nil
    }
}
