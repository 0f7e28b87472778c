package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical backward as-of join: a single-pass sort-merge.
  *
  * EnsureRequirements gives us both sides hash-partitioned on the key
  * (co-partitioned, like SortMergeJoin) and sorted within partitions by
  * (key, time[, tiebreak]); the merge then streams both iterators once with
  * O(1) state — the last matching right row — per partition. No window
  * buffers, no row explosion, no per-key hash map: strictly less state than
  * the union+window formulation, and exactly one shuffle + sort per side at
  * any scale.
  *
  * Tie semantics (deterministic): right rows with time == left time match
  * (inclusive); among equal right times the largest tiebreak wins.
  */
case class AsOfJoinExec(
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute],
    rightTiebreak: Attribute,
    output: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    // tiebreak NULLS LAST so a null-tiebreak row among equal times is
    // processed last and wins — matching the window implementation's
    // `asc_nulls_last` + last() semantics exactly
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTiebreak, Ascending,
        org.apache.spark.sql.catalyst.expressions.NullsLast, Seq.empty)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOutput = left.output
    val rightOutput = right.output
    val outAttrs = output
    val lKey = BindReferences.bindReference(
      leftKey: org.apache.spark.sql.catalyst.expressions.Expression, leftOutput)
    val lTime = BindReferences.bindReference(
      leftTime: org.apache.spark.sql.catalyst.expressions.Expression, leftOutput)
    val rKey = BindReferences.bindReference(
      rightKey: org.apache.spark.sql.catalyst.expressions.Expression, rightOutput)
    val rTime = BindReferences.bindReference(
      rightTime: org.apache.spark.sql.catalyst.expressions.Expression, rightOutput)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // right side becomes nullable in the output (unmatched rows carry a
      // null row); binding must see nullable attrs or codegen skips the
      // null check and reads 0s out of the all-null placeholder row.
      val joiner = UnsafeProjection.create(outAttrs,
        leftOutput ++ rightOutput.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = InternalRow.fromSeq(Seq.fill(rightOutput.size)(null))
      var rHead: InternalRow = null
      var lastMatch: InternalRow = null
      var lastMatchKey: Any = null

      lIter.map { l =>
        val lk = lKey.eval(l)
        val lt = lTime.eval(l)
        // null key or null time matches nothing (SQL 3VL); guarding here also
        // keeps the interpreted orderings away from nulls
        if (lk != null && lt != null) {
          var advance = true
          while (advance) {
            if (rHead == null && rIter.hasNext) rHead = rIter.next()
            if (rHead == null) advance = false
            else {
              val rk = rKey.eval(rHead)
              val rt = rTime.eval(rHead)
              if (rk == null || rt == null) { rHead = null } // nulls never match
              else {
                val c = keyOrd.compare(rk, lk)
                if (c < 0) {
                  // left is sorted ascending on key: no future left row can
                  // have this smaller key — discard
                  rHead = null
                } else if (c == 0 && timeOrd.lteq(rt, lt)) {
                  lastMatch = rHead.copy()
                  // re-evaluate the key from the COPIED row: for buffer-backed
                  // types (UTF8String/Binary/Decimal) `rk` points into the
                  // iterator's reused buffer and would be silently rewritten
                  // by the next rIter.next()
                  lastMatchKey = rKey.eval(lastMatch)
                  rHead = null
                } else {
                  advance = false
                }
              }
            }
          }
        }
        val matched = lk != null && lt != null && lastMatch != null &&
          keyOrd.compare(lastMatchKey, lk) == 0
        joiner(joined(l, if (matched) lastMatch else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
