package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule for the custom as-of operator (the `Rule[LogicalPlan]`
  * tier of SURVEY.md §2.9/§7.3): predicates that reference only LEFT-side
  * columns commute with a backward as-of join (each left row is enriched
  * independently), so push them below the operator. From there Catalyst's
  * `PhysicalOperation` collection carries them all the way into the parquet
  * scan's PushedFilters — without this rule, a filter above the custom node
  * is an optimization barrier and the scan reads everything.
  */
object PushLeftFilterThroughAsOf extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, a: AsOfJoinPlan) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(a.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = a.copy(left = Filter(push.reduce(And), a.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
