package graft.plans

import graft.functions.BitmapDistinct
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Opt-in Catalyst optimizer rule (injected by GraftExtensions):
  * `count(DISTINCT <integral>)` → the one-pass RoaringBitmap aggregate.
  *
  * Spark plans a single-distinct aggregate as TWO aggregation phases over
  * a shuffle of every distinct key; the bitmap aggregate is one pass
  * whose partial states are compressed runs (see BitmapDistinct). Both
  * are exact and ignore nulls, so the rewrite is semantics-preserving on
  * integral keys. Gated behind `spark.graft.bitmapDistinct.enabled`
  * (default off) — the explicit q_bitmap_distinct query form is always
  * available; the rule automates it for plain countDistinct call sites.
  */
case class RewriteDistinctToBitmap() extends Rule[LogicalPlan] {

  private def isIntegral(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString("spark.graft.bitmapDistinct.enabled", "false") != "true") plan
    else plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(Count(Seq(c)), mode, true, filter, _) if isIntegral(c) =>
            AggregateExpression(BitmapDistinct(c), mode, isDistinct = false, filter, ae.resultId)
        }
    }
}
