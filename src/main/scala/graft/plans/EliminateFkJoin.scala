package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, IsNotNull}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LeafNode, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule

/** Declared-integrity catalog behind [[EliminateFkJoin]]: (fact key name,
  * dim key name) pairs the deployment has VERIFIED — dim key unique, every
  * non-null fact key present in the dim (exactly what an A27 `dq_audit`
  * run proves: `pk_*_unique` and `fk_*_exists` both passing). Spark has
  * no FK metadata of its own, so this is the engine's catalog surface
  * for it. Name-based on purpose: in this engine column names ARE the
  * catalog identities (Tables.scala single-sources every scan).
  */
object FkRegistry {
  private val fks = scala.collection.concurrent.TrieMap.empty[(String, String), Unit]
  def declare(factKey: String, dimKey: String): Unit = fks.put((factKey, dimKey), ())
  def isVerified(factKey: String, dimKey: String): Boolean = fks.contains((factKey, dimKey))
  def clear(): Unit = fks.clear()
}

/** Opt-in Catalyst rule (injected by GraftExtensions, gated on
  * `spark.graft.fkJoinElimination.enabled` + a [[FkRegistry]] entry):
  * an INNER equi-join against a dim table is dropped entirely when
  *
  *  - the join keys are a declared-verified (FK, PK) pair,
  *  - the consumer projects ONLY fact-side columns, and
  *  - the dim side is a bare (possibly column-pruned) scan — any Filter
  *    on the dim would make the join selective and the rewrite unsound.
  *
  * Under verified integrity the join can only (a) drop null-FK fact rows
  * and (b) match each remaining row exactly once — so the whole
  * dim-scan + shuffle/broadcast disappears into `Filter(IsNotNull(fk))`.
  * Classic warehouse join elimination (views and BI tools emit these
  * joins constantly); Spark itself never does it because it has no FK
  * catalog. At 100 TB this deletes an entire dim broadcast — or worse, a
  * shuffle — per eliminated join. EliminateFkJoinSpec pins the rewrite,
  * its result-equality against the real join, and every unsound-shape
  * bailout (dim column consumed, undeclared pair, filtered dim).
  */
case class EliminateFkJoin() extends Rule[LogicalPlan] {

  /** A dim side is "bare" when it is just a (pruned) scan: aliases and
    * projections over a leaf — nothing that filters or multiplies rows.
    */
  private def isBareDim(p: LogicalPlan): Boolean = p match {
    case _: LeafNode => true
    case Project(_, child) => isBareDim(child)
    case SubqueryAlias(_, child) => isBareDim(child)
    case _ => false
  }

  /** The registry match is name-based, so the matched pk attribute must BE
    * the scanned catalog column of that name — not a computed expression a
    * Project aliased to it (`dim.select((x % 100).as("o_orderkey"))` would
    * otherwise pass isBareDim + the name check and eliminate a join that
    * can duplicate or drop fact rows). Walk the dim side: through Projects
    * the attribute must be a passthrough or a same-name rename of another
    * bare column, bottoming out at a leaf output of the same name.
    */
  private def tracesToLeafColumn(attr: AttributeReference, p: LogicalPlan): Boolean = p match {
    case leaf: LeafNode =>
      leaf.output.exists(o => o.exprId == attr.exprId && o.name == attr.name)
    case SubqueryAlias(_, child) => tracesToLeafColumn(attr, child)
    case Project(projList, child) =>
      projList.find(_.exprId == attr.exprId) match {
        case Some(ar: AttributeReference) => tracesToLeafColumn(ar, child)
        case Some(Alias(ar: AttributeReference, _)) if ar.name == attr.name =>
          tracesToLeafColumn(ar, child)
        case _ => false
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString("spark.graft.fkJoinElimination.enabled", "false") != "true") plan
    else plan.transformUp {
      case p @ Project(projList,
          Join(left, right, Inner, Some(EqualTo(a: AttributeReference, b: AttributeReference)), _)) =>
        // orient the equality: fact key from the projected side, pk from the dim
        val oriented =
          if (left.outputSet.contains(a) && right.outputSet.contains(b)) Some((a, b))
          else if (left.outputSet.contains(b) && right.outputSet.contains(a)) Some((b, a))
          else None
        oriented match {
          case Some((fk, pk))
              if p.references.subsetOf(left.outputSet) &&
                FkRegistry.isVerified(fk.name, pk.name) &&
                isBareDim(right) && tracesToLeafColumn(pk, right) =>
            Project(projList, Filter(IsNotNull(fk), left))
          case _ => p
        }
    }
}
