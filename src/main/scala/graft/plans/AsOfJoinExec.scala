package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Whole-operator as-of join (SURVEY §7.3's "stretch" tier (c): custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`).
  *
  * The engine's default as-of formulation is the union+window rewrite
  * ([[graft.operators.AsOfJoin.lastBefore]]) — one shuffle, stock operators,
  * AQE-friendly. This operator exists for the case the rewrite can't
  * express as cheaply: the rewrite materializes |L|+|R| rows through a
  * window with a running `last(payload)` per row, while this physical
  * operator streams BOTH sorted sides through a single forward merge per
  * key partition — no union row blow-up, no window buffer, O(|L|+|R|) time
  * and O(1) memory per partition beyond the sorts it shares with any SMJ.
  *
  * Semantics (identical to `lastBefore`, twinned with DuckDB
  * `ASOF JOIN … ON l.key = r.key AND l.ts >= r.ts`): each left row picks
  * the LAST right row of the same key at-or-before (inclusive) / strictly
  * before its timestamp; unmatched left rows keep a null payload; null keys
  * never match. Right-side equal-ts ties resolve to the latest row in the
  * right child's (key, ts, tieBreak…) sort order.
  *
  * Distribution/ordering contract: both children clustered on their key
  * columns and sorted by (keys…, ts[, tieBreak…]) — EnsureRequirements
  * inserts the exchanges/sorts, exactly as for a sort-merge join, and both
  * disappear when the inputs are already stored in the bucketed series
  * layout ([[graft.sources.BucketedLayout]]).
  *
  * `ts` columns must be long-backed (TimestampType or LongType) — true of
  * every time axis in this engine (µs timestamps or raw nanos longs).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    payload: Seq[Attribute],
    inclusive: Boolean,
    rightTieBreak: Seq[Attribute]) extends BinaryNode {

  require(leftKeys.size == rightKeys.size && leftKeys.nonEmpty)
  require(Seq(TimestampType, LongType).contains(leftTs.dataType) &&
          rightTs.dataType == leftTs.dataType,
          "as-of time axis must be a long-backed column of the same type on both sides")

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
                                                 newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfMergeJoinExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    payload: Seq[Attribute],
    inclusive: Boolean,
    rightTieBreak: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys ++ (rightTs +: rightTieBreak))
      .map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val inclusiveB = inclusive
    val leftOut = left.output
    val rightOut = right.output
    val leftKeysB = leftKeys
    val rightKeysB = rightKeys
    val lTsOrdinal = leftOut.indexWhere(_.exprId == leftTs.exprId)
    val rTsOrdinal = rightOut.indexWhere(_.exprId == rightTs.exprId)
    val payloadB = payload
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeysB, leftOut)
      val rKeyProj = UnsafeProjection.create(rightKeysB, rightOut)
      val rPayloadProj = UnsafeProjection.create(payloadB, rightOut)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(leftKeysB.map(_.dataType))
      // input schema must carry the RELAXED nullability: unmatched rows feed
      // a null payload row, and a projection bound non-nullable would read
      // raw zeros out of it instead of nulls
      val resultProj = UnsafeProjection.create(outAttrs,
        leftOut ++ payloadB.map(_.withNullability(true)))
      val nullPayload = new GenericInternalRow(payloadB.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // the next unconsumed right row (buffered copy) and its key
        private var rRow: UnsafeRow = _
        private var rKey: UnsafeRow = _
        // last right row matched for `matchKey` (payload projection, copied)
        private var lastPayload: UnsafeRow = _
        private var matchKey: UnsafeRow = _

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            val r = rIter.next()
            rKey = rKeyProj(r).copy()
            rRow = r.asInstanceOf[UnsafeRow].copy()
          } else { rRow = null; rKey = null }

        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTs = l.getLong(lTsOrdinal)
          // consume right rows up to (and for inclusive, at) the left ts
          var continue = rRow != null
          while (continue) {
            val cmp = keyOrd.compare(rKey, lKey)
            if (cmp < 0) advanceRight()
            else if (cmp == 0) {
              val rTs = rRow.getLong(rTsOrdinal)
              if (rTs < lTs || (inclusiveB && rTs == lTs)) {
                if (!rKey.anyNull) {
                  lastPayload = rPayloadProj(rRow).copy()
                  matchKey = rKey
                }
                advanceRight()
              } else continue = false
            } else continue = false
            if (rRow == null) continue = false
          }
          val matched = lastPayload != null && !lKey.anyNull &&
            matchKey != null && keyOrd.compare(matchKey, lKey) == 0
          resultProj(joined(l, if (matched) lastPayload else nullPayload))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
                                                 newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy turning the logical as-of node into the merge exec. */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, p, inc, tb) =>
      AsOfMergeJoinExec(lk, rk, lts, rts, p, inc, tb, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}
