package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
import org.apache.spark.sql.types.StringType

/** A DSv2 table that can serve a RETRACTION-AWARE streaming change feed
  * of itself: same columns plus a trailing `_change_type`
  * (insert/delete) column. Implemented by graft.sources.GraftTable.
  */
trait ChangeFeedCapableTable {
  /** The feed-shaped twin: schema = table schema + `_change_type`,
    * micro-batches = materialized change-data windows.
    */
  def changeFeedTable(): org.apache.spark.sql.connector.catalog.Table
}

/** Resolves `.option("changefeed", true).table(cat.t)` on BOTH read
  * surfaces: a relation's OUTPUT is fixed from the table's schema at
  * analysis, so the scan alone cannot widen it with `_change_type` —
  * the rule (the same shape Delta uses for its CDF read option) swaps
  * the relation's table for the feed-shaped twin and appends the
  * `_change_type` attribute BEFORE the scan materializes.
  *
  *  - `spark.readStream...` ([[StreamingRelationV2]]): per-commit
  *    change windows as micro-batches.
  *  - `spark.read...` (batch [[DataSourceV2Relation]]): ONE window
  *    `(startsnapshot, versionAsOf-or-current]` — the TVF's batch CDF
  *    semantics served DSv2-native from the same materialized cache.
  *
  * Extension-less sessions never match (the option then refuses loudly
  * inside GraftTable.newScanBuilder, rather than delivering rows
  * positionally misaligned with the declared output).
  */
case class ExpandChangeFeedRelation(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case r: StreamingRelationV2
        if r.table.isInstanceOf[ChangeFeedCapableTable] &&
          Option(r.extraOptions.get("changefeed")).exists(_.toBoolean) &&
          !r.output.exists(_.name == "_change_type") =>
      r.copy(
        table = r.table.asInstanceOf[ChangeFeedCapableTable].changeFeedTable(),
        output = r.output :+
          AttributeReference("_change_type", StringType, nullable = false)())
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
        if r.table.isInstanceOf[ChangeFeedCapableTable] &&
          Option(r.options.get("changefeed")).exists(_.toBoolean) &&
          !r.output.exists(_.name == "_change_type") =>
      r.copy(
        table = r.table.asInstanceOf[ChangeFeedCapableTable].changeFeedTable(),
        output = r.output :+
          AttributeReference("_change_type", StringType, nullable = false)())
  }
}
