package graft.plans

import org.apache.spark.sql.catalyst.catalog.HiveTableRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, AttributeSet, EqualTo, IsNotNull}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LeafNode, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Declared-integrity catalog behind [[EliminateFkJoin]]: per DIM TABLE,
  * (fact key name, dim key name) pairs the deployment has VERIFIED — dim
  * key unique, every non-null fact key present in the dim (exactly what
  * an A27 `dq_audit` run proves: `pk_*_unique` and `fk_*_exists` both
  * passing). Spark has no FK metadata of its own, so this is the
  * engine's catalog surface for it.
  *
  * Declarations are keyed on the dim's TABLE IDENTITY, not bare column
  * names: two unrelated tables may both expose a column named
  * `o_orderkey`, and only the one the audit actually verified may
  * license the rewrite. The identity is the same one `Tables.scala`
  * single-sources every scan under — the extension-stripped basename of
  * the scan's root path (`<dir>/orders.parquet` → `orders`, at any scale
  * directory), or the catalog identifier for catalog-backed scans; the
  * rule resolves the matched pk attribute down to its leaf scan and
  * checks THAT leaf's identity against the declaration
  * ([[EliminateFkJoin.leafIdent]]).
  */
object FkRegistry {
  private val fks = scala.collection.concurrent.TrieMap.empty[(String, String, String), Unit]
  private val uniques = scala.collection.concurrent.TrieMap.empty[(String, String), Unit]
  def declare(dimTable: String, factKey: String, dimKey: String): Unit =
    fks.put((dimTable, factKey, dimKey), ())
  def isVerified(dimTable: String, factKey: String, dimKey: String): Boolean =
    fks.contains((dimTable, factKey, dimKey))
  /** The uniqueness half alone (a passing `pk_*_unique` audit with no
    * claim about fact-side totality) — all a LEFT join needs.
    */
  def declareUnique(dimTable: String, dimKey: String): Unit =
    uniques.put((dimTable, dimKey), ())
  def isUnique(dimTable: String, dimKey: String): Boolean =
    uniques.contains((dimTable, dimKey)) ||
      fks.keysIterator.exists(k => k._1 == dimTable && k._3 == dimKey)
  def clear(): Unit = { fks.clear(); uniques.clear() }
}

/** Opt-in Catalyst rule (injected by GraftExtensions, gated on
  * `spark.graft.fkJoinElimination.enabled` + a [[FkRegistry]] entry):
  * an INNER equi-join against a dim table is dropped entirely when
  *
  *  - the join keys are a declared-verified (FK, PK) pair FOR THE dim
  *    table the pk column actually scans (declarations are bound to
  *    table identity — a same-named column on any other table never
  *    licenses the rewrite),
  *  - the consumer (a Project's select list, or an Aggregate's grouping
  *    keys + aggregate inputs — the BI-view rollup shape) references
  *    ONLY fact-side columns, and
  *  - the dim side is a bare (possibly column-pruned) scan — any Filter
  *    on the dim would make the join selective and the rewrite unsound.
  *
  * Under verified integrity the join can only (a) drop null-FK fact rows
  * and (b) match each remaining row exactly once — so the whole
  * dim-scan + shuffle/broadcast disappears into `Filter(IsNotNull(fk))`.
  * A LEFT OUTER join to a declared-unique dim key is eliminable under
  * weaker premises: unmatched fact rows are preserved anyway, so only
  * uniqueness matters, no residual filter is needed, and even a filtered
  * dim is admissible. Classic warehouse join elimination (views and BI
  * tools emit these joins constantly); Spark itself never does it
  * because it has no FK catalog. At 100 TB this deletes an entire dim
  * broadcast — or worse, a shuffle — per eliminated join.
  * EliminateFkJoinSpec pins the rewrite, its result-equality against the
  * real join, and every unsound-shape bailout (dim column consumed,
  * undeclared pair, filtered dim, same-named column on an undeclared
  * table).
  */
case class EliminateFkJoin() extends Rule[LogicalPlan] {

  /** A dim side is "bare" when it is just a (pruned) scan: aliases and
    * projections over a leaf — nothing that filters or multiplies rows.
    * For the LEFT-join case a Filter is admissible (`allowFilter`): a
    * left join preserves the fact multiset whatever the dim filters
    * away, and filtering cannot break the dim key's uniqueness — only
    * row-multiplying shapes (aggregates, generators, joins) bail.
    */
  private def isBareDim(p: LogicalPlan, allowFilter: Boolean): Boolean = p match {
    case _: LeafNode => true
    case Project(_, child) => isBareDim(child, allowFilter)
    case SubqueryAlias(_, child) => isBareDim(child, allowFilter)
    case Filter(_, child) if allowFilter => isBareDim(child, allowFilter)
    case _ => false
  }

  /** Resolve the matched pk attribute down to the LEAF SCAN it reads —
    * the attribute must BE the scanned catalog column of that name, not
    * a computed expression a Project aliased to it
    * (`dim.select((x % 100).as("o_orderkey"))` would otherwise pass
    * isBareDim + the name check and eliminate a join that can duplicate
    * or drop fact rows). Walk the dim side: through Projects the
    * attribute must be a passthrough or a same-name rename of another
    * bare column, bottoming out at a leaf output of the same name; the
    * leaf is returned so the caller can bind the registry check to ITS
    * identity.
    */
  private def leafOf(attr: AttributeReference, p: LogicalPlan): Option[LeafNode] = p match {
    case leaf: LeafNode =>
      if (leaf.output.exists(o => o.exprId == attr.exprId && o.name == attr.name)) Some(leaf)
      else None
    case SubqueryAlias(_, child) => leafOf(attr, child)
    case Filter(_, child) => leafOf(attr, child)
    case Project(projList, child) =>
      projList.find(_.exprId == attr.exprId) match {
        case Some(ar: AttributeReference) => leafOf(ar, child)
        case Some(Alias(ar: AttributeReference, _)) if ar.name == attr.name =>
          leafOf(ar, child)
        case _ => None
      }
    case _ => None
  }

  /** Table identity of a leaf scan, in the registry's terms: the
    * extension-stripped basename of the file scan's root path (the
    * engine's `Tables.scala` convention — `<anydir>/orders.parquet` is
    * the logical table `orders` at every scale factor), the catalog
    * identifier for catalog/v2 tables. Multi-root scans must agree on
    * one identity; anything unidentifiable (LocalRelation, in-memory)
    * yields None and the rewrite never fires.
    */
  private def leafIdent(leaf: LeafNode): Option[String] = {
    def strip(name: String): String = {
      val exts = Seq(".parquet", ".orc", ".csv", ".json", ".avro")
      exts.find(name.endsWith).map(name.stripSuffix).getOrElse(name)
    }
    leaf match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          val idents = fs.location.rootPaths.map(p => strip(p.getName)).distinct
          if (idents.length == 1) Some(idents.head)
          else lr.catalogTable.map(_.identifier.unquotedString)
        case _ => lr.catalogTable.map(_.identifier.unquotedString)
      }
      case v2: DataSourceV2Relation => Option(v2.table).map(_.name)
      case h: HiveTableRelation => Some(h.tableMeta.identifier.unquotedString)
      case _ => None
    }
  }

  /** If `join` is an eliminable verified-FK inner join whose consumer
    * references only fact-side columns, return the replacement child
    * (`Filter(IsNotNull(fk), fact)`); None means keep the join.
    */
  private def eliminated(join: Join, consumerRefs: AttributeSet): Option[LogicalPlan] = join match {
    case Join(left, right, jt @ (Inner | LeftOuter),
        Some(EqualTo(a: AttributeReference, b: AttributeReference)), _) =>
      // orient the equality: fact key from the consumed side, pk from the dim
      val oriented =
        if (left.outputSet.contains(a) && right.outputSet.contains(b)) Some((a, b))
        else if (left.outputSet.contains(b) && right.outputSet.contains(a)) Some((b, a))
        else None
      def dimTable(pk: AttributeReference): Option[String] =
        leafOf(pk, right).flatMap(leafIdent)
      oriented.collect {
        // INNER: needs the full verified pair — uniqueness (no dup) AND
        // fact-side totality (no drop beyond null FKs) — declared FOR
        // this dim table, and a bare, unfiltered dim; the join reduces
        // to the null-FK filter.
        case (fk, pk)
            if jt == Inner &&
              consumerRefs.subsetOf(left.outputSet) &&
              isBareDim(right, allowFilter = false) &&
              dimTable(pk).exists(t => FkRegistry.isVerified(t, fk.name, pk.name)) =>
          Filter(IsNotNull(fk), left)
        // LEFT OUTER: uniqueness alone suffices — the fact multiset is
        // preserved whether or not a row matches, so the join vanishes
        // with NO residual filter, and a filtered dim is fine (it can
        // only turn matches into preserved non-matches nobody reads).
        case (fk, pk)
            if jt == LeftOuter &&
              consumerRefs.subsetOf(left.outputSet) &&
              isBareDim(right, allowFilter = true) &&
              dimTable(pk).exists(t => FkRegistry.isUnique(t, pk.name)) =>
          left
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString("spark.graft.fkJoinElimination.enabled", "false") != "true") plan
    else plan.transformUp {
      case p @ Project(projList, join: Join) =>
        eliminated(join, p.references)
          .map(fact => Project(projList, fact)).getOrElse(p)
      // the BI-view rollup shape: CollapseProject folds the SELECT list
      // straight into the Aggregate, so the join sits directly under it —
      // grouping keys and agg inputs play the consumer role the Project's
      // select list plays above
      case a @ Aggregate(_, _, join: Join, _) =>
        eliminated(join, a.references)
          .map(fact => a.copy(child = fact)).getOrElse(a)
    }
}
