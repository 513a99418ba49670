package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a first-class Catalyst operator: a custom LogicalPlan,
  * planner Strategy, and merge-scan SparkPlan (SURVEY §2.3's audio->video
  * temporal alignment, `dpl/processor/nodes/a2en.py:41-42`, as a
  * relational operator — preference tier (c) from the build brief).
  *
  * Semantics match DuckDB's `ASOF JOIN ... ON l.key = r.key AND l.ts >=
  * r.ts`: each left row is joined to the LATEST right row with the same
  * key and ts <= left.ts (ties match). `inner=false` keeps unmatched left
  * rows with null values.
  *
  * Scale posture: each side shuffles ONCE on its key (EnsureRequirements
  * satisfies the ClusteredDistribution pair with co-partitioned
  * exchanges) and sorts on (key, ts); the join itself is a single forward
  * merge scan per partition — no window buffer over the unioned sides,
  * no null-padded union rows, and the right side's values never sort
  * together with left data (the union+window formulation in
  * [[graft.operators.AsOf]] pays both). State per partition is one
  * buffered right row — skew-safe in memory even when one key dominates.
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    inner: Boolean) extends BinaryNode {

  /** Right columns carried to the output (everything but key + ts). */
  lazy val rightValues: Seq[Attribute] = right.output
    .filterNot(a => a.exprId == rightKey.exprId || a.exprId == rightTs.exprId)

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(a => if (inner) a else a.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] as [[AsofJoinExec]]. Registered through
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions) or
  * post-hoc via `spark.experimental.extraStrategies`. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsofJoinPlan =>
      AsofJoinExec(planLater(p.left), planLater(p.right),
        p.leftKey, p.rightKey, p.leftTs, p.rightTs,
        p.rightValues, p.output, p.inner) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: requires both children clustered on their key and
  * sorted by (key, ts); emits one output row per surviving left row via a
  * single merge scan. Output preserves the left child's partitioning and
  * (key, ts) ordering, so a downstream window/agg on the same key reuses
  * the exchange.
  */
case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    rightValues: Seq[Attribute], output: Seq[Attribute],
    inner: Boolean) extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
        Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val numValues = rightValues.length
    val isInner = inner
    // bound extractors resolved on the driver, shipped to executors
    val lKeyB = BindReferences.bindReference(leftKey: Expression, left.output)
    val lTsB = BindReferences.bindReference(leftTs: Expression, left.output)
    val rKeyB = BindReferences.bindReference(rightKey: Expression, right.output)
    val rTsB = BindReferences.bindReference(rightTs: Expression, right.output)
    val rightOut = right.output
    val leftOut = left.output
    val rightVals = rightValues
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val valProj = UnsafeProjection.create(rightVals, rightOut)
      // bind the values side as nullable: in outer mode the null-fill row
      // must be READ as null (a non-nullable BoundReference skips the
      // null-bit check and would surface 0/garbage instead)
      val resultProj = UnsafeProjection.create(outAttrs,
        leftOut ++ rightVals.map(_.withNullability(true)))
      val nullVals = new GenericInternalRow(numValues)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var matchKey: Any = null
        private var matchVals: UnsafeRow = null
        private var pending: InternalRow = null

        private def advanceRight(): Unit =
          rHead = if (rIter.hasNext) rIter.next() else null

        /** Consume right rows until rHead is the first row strictly after
          * (lk, lts); the last consumed same-key row becomes the match. */
        private def catchUp(lk: Any, lts: Any): Unit = {
          var done = false
          while (!done && rHead != null) {
            val rk = rKeyB.eval(rHead)
            if (rk == null) advanceRight() // null keys never match
            else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) advanceRight()
              else if (c == 0) {
                val rts = rTsB.eval(rHead)
                if (rts == null) advanceRight() // null ts never matches
                else if (tsOrd.compare(rts, lts) <= 0) {
                  // latest-so-far for this key; values copied out of the
                  // iterator's reused row buffer
                  matchKey = InternalRow.copyValue(rk)
                  matchVals = valProj(rHead).copy()
                  advanceRight()
                } else done = true
              } else done = true
            }
          }
        }

        override def hasNext: Boolean = {
          while (pending == null && lIter.hasNext) {
            val l = lIter.next()
            val lk = lKeyB.eval(l)
            val lts = lTsB.eval(l)
            if (lk == null || lts == null) {
              if (!isInner) pending = resultProj(joined(l, nullVals))
            } else {
              catchUp(lk, lts)
              val hasMatch = matchVals != null && matchKey != null &&
                keyOrd.compare(matchKey, lk) == 0
              if (hasMatch) pending = resultProj(joined(l, matchVals))
              else if (!isInner) pending = resultProj(joined(l, nullVals))
            }
          }
          pending != null
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          val out = pending
          pending = null
          out
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
