package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Custom whole-operator as-of join — the (c) tier of the custom-operator
  * preference order (SURVEY.md §4.2: "the one place a custom operator could
  * pay off").
  *
  * Semantics: polars `join_asof(strategy='backward', by=key)` / DuckDB
  * `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts` — each left row
  * picks the latest right row at-or-before its timestamp within its key
  * group, or nulls.
  *
  * Scale shape: both sides hash-partition by key and sort by (key, ts) —
  * exactly a sort-merge join's movement — then a single forward merge pass
  * per partition with O(1) state (the last right row seen). No union blowup,
  * no window buffering, no range explosion; AQE still handles skew on the
  * exchanges it inserts for the required distribution.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Co-partition both sides by key (EnsureRequirements inserts the
    * exchanges and co-partitions them, as for sort-merge join). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  /** Within partitions, sort by (key, ts) so one merge pass suffices. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)) ::
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) :: Nil

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTs, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTs, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val rightWidth = right.output.length
    val schema = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val project = UnsafeProjection.create(schema.map(_.dataType).toArray)
      val joined = new JoinedRow
      val nullRight = InternalRow.fromSeq(Seq.fill(rightWidth)(null))
      val buffered = rIter.buffered

      // last right row (copied — unsafe rows are reused) per current key
      var lastKey: Any = null
      var lastRow: InternalRow = null

      lIter.map { lRow =>
        val lk = lkB.eval(lRow)
        val lt = ltB.eval(lRow)
        // advance the right side while its (key, ts) <= (lk, lt)
        var advancing = true
        while (advancing && buffered.hasNext) {
          val rRow = buffered.head
          val rk = rkB.eval(rRow)
          val keyCmp = keyOrd.compare(rk, lk)
          if (keyCmp < 0 ||
            (keyCmp == 0 && tsOrd.compare(rtB.eval(rRow), lt) <= 0)) {
            lastKey = rk
            lastRow = rRow.copy()
            buffered.next()
          } else advancing = false
        }
        val matches = lastRow != null && keyOrd.compare(lastKey, lk) == 0
        project(joined(lRow, if (matches) lastRow else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
