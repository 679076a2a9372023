package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join as a first-class plan node — tier (c) of the
  * custom-operator ladder: LogicalPlan + Strategy + SparkPlan, injected
  * via SparkSessionExtensions (GraftExtensions). The composed B13 query
  * (union + running-last window, Relational.asofJoin) expresses the same
  * semantics through built-ins; this node gives Catalyst the operator AS
  * an operator: one merge scan per co-partition instead of a union sort
  * carrying both sides through a window, with the planner free to satisfy
  * the distribution/ordering requirements from whatever the children
  * already provide — and column pruning still works through the node,
  * because the key/time/tiebreak attributes are declared as `references`
  * and the exec binds their ordinals by exprId, never by position.
  *
  * Each left row joins the latest right row with the same key and
  * time ≤ the left time (inclusive); among right rows tied on
  * (key, time), the LAST in (key, time, tiebreak) sort order wins —
  * matching the composed query's "largest order id" rule. Output = left
  * columns ++ right columns (right side nullable).
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute,
    rightTie: Option[Attribute]) extends BinaryNode {
  // the exec's merge scan reads key/time as primitive longs; anything else
  // must fail at construction, not read garbage at runtime
  for (a <- Seq(leftKey, leftTime, rightKey, rightTime))
    require(a.dataType == org.apache.spark.sql.types.LongType,
      s"as-of join key/time must be LongType, got ${a.dataType} for $a")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  // pins the join columns against ColumnPruning; payload columns remain
  // prunable as usual
  override def references: AttributeSet =
    AttributeSet(Seq(leftKey, leftTime, rightKey, rightTime) ++ rightTie)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] as [[AsOfJoinExec]]; everything else falls
  * through to the built-in strategies.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, tie) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join: requires both children clustered on the key
  * and sorted by (key, time[, tiebreak]) — EnsureRequirements inserts
  * exchanges/sorts only where the children don't already satisfy them
  * (the same contract SortMergeJoinExec rides). Per co-partition, ONE
  * forward merge scan: right rows are consumed up to each left row's
  * (key, time) and the most recent same-key row is retained —
  * O(|L|+|R|) per partition, no per-row probe, no window buffering.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute,
    rightTie: Option[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTie.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // rows are emitted in left iteration order, so the left requirement holds
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val allOut = output
    val nRight = rightOut.size
    def ordinal(a: Attribute, out: Seq[Attribute]): Int = {
      val i = out.indexWhere(_.exprId == a.exprId)
      require(i >= 0, s"attribute $a not found in ${out.mkString(",")}")
      i
    }
    val lkOrd = ordinal(leftKey, leftOut)
    val ltOrd = ordinal(leftTime, leftOut)
    val rkOrd = ordinal(rightKey, rightOut)
    val rtOrd = ordinal(rightTime, rightOut)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      // bind against the NULLABLE view of the right schema: the projection's
      // null checks come from the input-schema nullability, and unmatched
      // left rows feed an all-null right — binding against the child's
      // original non-nullable attrs would silently read nulls as 0
      val proj = UnsafeProjection.create(allOut,
        leftOut ++ rightOut.map(_.withNullability(true)))
      // hot path: both sides arrive as UnsafeRow off the sort, and output =
      // left ++ right verbatim, so emit via the codegen'd UnsafeRowJoiner
      // (two memcpys + bitset splice) instead of a per-field projection —
      // the same emit shape CartesianProductExec rides; `proj` stays as the
      // fallback for any non-Unsafe input row
      val joiner = org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeRowJoiner
        .create(
          org.apache.spark.sql.catalyst.types.DataTypeUtils.fromAttributes(leftOut),
          org.apache.spark.sql.catalyst.types.DataTypeUtils.fromAttributes(
            rightOut.map(_.withNullability(true))))
      // the all-null right row as an UnsafeRow, for joiner-path non-matches
      val nullRightU = UnsafeProjection.create(
        rightOut.map(_.withNullability(true)), rightOut.map(_.withNullability(true)))
        .apply(nullRight).copy()
      val rBuf = rIter.buffered
      var lastKey = 0L
      var hasLast = false
      var lastMatch: InternalRow = null
      // sort iterators reuse their row buffer, so a retained right row must
      // be copied before the next peek — into a REUSED UnsafeRow (bytes
      // memcpy, no allocation): the per-row copy() alloc was the dominant
      // cost of the interpreted merge (asof_10x A/B in BASELINE.md).
      // MUST be pointed at a byte[] before the first copyFrom: copyFrom
      // grows the buffer but keeps baseOffset, and a fresh UnsafeRow's
      // offset of 0 would make copyMemory write over the array header
      val matchBuf = new UnsafeRow(nRight)
      matchBuf.pointTo(new Array[Byte](64), 64)
      def emit(l: InternalRow, m: InternalRow): InternalRow =
        if (l.isInstanceOf[UnsafeRow] && m.isInstanceOf[UnsafeRow])
          joiner.join(l.asInstanceOf[UnsafeRow], m.asInstanceOf[UnsafeRow])
        else proj(joined(l, m))
      lIter.map { l =>
        // SQL semantics: NULL never equals — a null-key/time left row takes
        // the null-extended output without advancing the scan (reading it
        // as 0 via getLong would spuriously match a real key-0 partner)
        if (l.isNullAt(lkOrd) || l.isNullAt(ltOrd)) {
          emit(l, nullRightU)
        } else {
          val lk = l.getLong(lkOrd)
          val lt = l.getLong(ltOrd)
          var scanning = true
          while (scanning && rBuf.hasNext) {
            val h = rBuf.head
            if (h.isNullAt(rkOrd) || h.isNullAt(rtOrd)) {
              rBuf.next() // null key/time can never join any left row
            } else {
              val rk = h.getLong(rkOrd)
              if (rk < lk || (rk == lk && h.getLong(rtOrd) <= lt)) {
                val r = rBuf.next()
                if (rk == lk) {
                  lastMatch = r match {
                    case u: UnsafeRow => matchBuf.copyFrom(u); matchBuf
                    case other => other.copy()
                  }
                  lastKey = lk; hasLast = true
                }
              } else scanning = false
            }
          }
          val m = if (hasLast && lastKey == lk) lastMatch else nullRightU
          emit(l, m)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
