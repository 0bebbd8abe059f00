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
  * Semantics: polars `join_asof(strategy=..., by=key, tolerance=...)` /
  * DuckDB `ASOF LEFT JOIN` — each left row picks, within its key group:
  *   - backward: the latest right row at-or-before its timestamp;
  *   - forward: the earliest right row at-or-after its timestamp;
  *   - nearest: the closer of the two, backward winning exact ties;
  * and nulls when no match (or when `toleranceMicros` is set and the pick
  * is farther than the tolerance).
  *
  * Scale shape: both sides hash-partition by key and sort by (key, ts) —
  * exactly a sort-merge join's movement — then a single forward merge pass
  * per partition with O(1) state (the last consumed right row plus the
  * buffered head as the forward candidate). No union blowup, no window
  * buffering, no range explosion; AQE still handles skew on the exchanges
  * it inserts for the required distribution.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    strategy: String = "backward",
    toleranceMicros: Option[Long] = None) extends BinaryNode {
  require(Set("backward", "forward", "nearest").contains(strategy),
    s"unknown as-of strategy: $strategy")
  // nearest/tolerance compare time DISTANCES as raw internal longs, which
  // is only meaningful for micros-backed timestamps or plain long columns.
  // A DateType column would silently feed its internal DAY count into a
  // microsecond tolerance — wrong by 8.64e10, so reject at construction.
  if ((strategy == "nearest" || toleranceMicros.isDefined) &&
      leftTs.resolved && rightTs.resolved) {
    import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}
    val micros: DataType => Boolean = {
      case TimestampType | TimestampNTZType | LongType => true
      case _ => false
    }
    require(micros(leftTs.dataType) && micros(rightTs.dataType),
      s"as-of strategy=$strategy tolerance=$toleranceMicros requires " +
        "Timestamp/TimestampNTZ/Long time columns, got " +
        s"${leftTs.dataType.simpleString}/${rightTs.dataType.simpleString}")
  }
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, strategy, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, strategy, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    strategy: String = "backward",
    toleranceMicros: Option[Long] = None) extends BinaryExecNode {

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

  /** Micros/integral view of a time value — needed only by nearest
    * (distance compare) and tolerance. Timestamps are Long internally. */
  private def toLong(v: Any): Long = v match {
    case l: java.lang.Long => l.longValue()
    case i: java.lang.Integer => i.longValue()
    case s: java.lang.Short => s.longValue()
    case b: java.lang.Byte => b.longValue()
    case other => throw new IllegalArgumentException(
      s"as-of nearest/tolerance requires an integral or timestamp time column, got $other")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTs, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTs, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val rightWidth = right.output.length
    val schema = output
    val strat = strategy
    val tol = toleranceMicros

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val project = UnsafeProjection.create(schema.map(_.dataType).toArray)
      val joined = new JoinedRow
      val nullRight = InternalRow.fromSeq(Seq.fill(rightWidth)(null))
      val buffered = rIter.buffered
      // equal-ts right rows belong to the backward candidate except under
      // strategy=forward, where they are the forward candidate instead
      val consumeEqualTs = strat != "forward"

      // last consumed right row (copied — unsafe rows are reused) + its key
      var lastKey: Any = null
      var lastRow: InternalRow = null

      lIter.map { lRow =>
        val lk = lkB.eval(lRow)
        val lt = ltB.eval(lRow)
        // a null key or time has no as-of position (and the interpreted
        // orderings below are not null-tolerant) — such left rows emit
        // no-match, such right rows are consumed but never candidates.
        // Matches Polars join_asof: null never matches anything.
        if (lk == null || lt == null) {
          project(joined(lRow, nullRight))
        } else {
        // consume the right side up to this left row's boundary
        var advancing = true
        while (advancing && buffered.hasNext) {
          val rRow = buffered.head
          val rk = rkB.eval(rRow)
          if (rk == null) { buffered.next() } // nulls sort first: skip
          else {
            val rt = rtB.eval(rRow)
            val keyCmp = keyOrd.compare(rk, lk)
            if (keyCmp == 0 && rt == null) {
              buffered.next() // null ts sorts first in the group: skip
            } else {
              val consume =
                if (keyCmp != 0) keyCmp < 0
                else {
                  val tsCmp = tsOrd.compare(rt, lt)
                  if (consumeEqualTs) tsCmp <= 0 else tsCmp < 0
                }
              if (consume) {
                lastKey = rk
                lastRow = rRow.copy()
                buffered.next()
              } else advancing = false
            }
          }
        }
        val back =
          if (lastRow != null && keyOrd.compare(lastKey, lk) == 0) lastRow else null
        lazy val fwd =
          if (buffered.hasNext && keyOrd.compare(rkB.eval(buffered.head), lk) == 0)
            buffered.head
          else null
        val chosen = strat match {
          case "backward" => back
          case "forward" => fwd
          case "nearest" =>
            if (back == null) fwd
            else if (fwd == null) back
            else {
              val backDist = toLong(lt) - toLong(rtB.eval(back))
              val fwdDist = toLong(rtB.eval(fwd)) - toLong(lt)
              if (backDist <= fwdDist) back else fwd
            }
        }
        val withinTol = chosen != null && tol.forall { t =>
          math.abs(toLong(lt) - toLong(rtB.eval(chosen))) <= t
        }
        project(joined(lRow, if (withinTol) chosen else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
