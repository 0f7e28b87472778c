package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical as-of join (backward / inclusive): for each left row, the latest
  * right row with the same key and right.time <= left.time.
  *
  * This is the whole-operator extension tier of SURVEY.md §2.9(c): Spark has
  * no as-of join, and while graft.ops.AsOfJoin composes one from
  * union+window, a dedicated operator expresses the intent directly and
  * executes as a streaming sort-merge with zero per-key state (see
  * [[graft.plans.AsOfJoinExec]]).
  *
  * Output: left.output ++ right value columns (renamed asof_*, nullable) ++
  * right time (renamed asof_time, nullable).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute],
    rightTiebreak: Attribute)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++
      rightValues.map(a => a.withNullability(true).withName(s"asof_${a.name}")) :+
      rightTime.withNullability(true).withName("asof_time")

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}
