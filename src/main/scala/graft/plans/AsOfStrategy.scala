package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkPlan

/** Planner strategy mapping the logical as-of join to its sort-merge
  * physical operator. Registered per-session via
  * `spark.experimental.extraStrategies` (the public injection point;
  * `SparkSessionExtensions.injectPlannerStrategy` is the builder-time
  * equivalent for sessions we construct ourselves).
  */
object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKey, p.rightKey, p.leftTime, p.rightTime,
        p.rightValues, p.rightTiebreak, p.output,
        planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }

  /** Idempotently register on a session (strategy + companion optimizer
    * rule — pushdown through the operator must come with the operator).
    */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    if (!spark.experimental.extraOptimizations.contains(PushLeftFilterThroughAsOf))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushLeftFilterThroughAsOf
  }
}

/** DataFrame-level API over the custom operator. */
object AsOfJoinCustom {

  def backward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      rightTiebreak: String): DataFrame = {
    val spark = left.sparkSession
    AsOfStrategy.register(spark)
    // The operator appends asof_time / asof_<v> output columns and prefixes
    // right columns with __r_; a left column already in that namespace would
    // make the restoring select ambiguous at analysis. Enforce the reserved
    // namespace at bind time with the typed GraftError contract instead.
    left.columns.filter(c => c.startsWith("asof_") || c.startsWith("__r_"))
      .foreach(c => throw graft.types.DuplicateAttribute(
        s"$c (asof_*/__r_* names are reserved by the as-of join)"))
    // Re-alias every right column: left and right often derive from the same
    // relation (self-as-of), and shared attribute exprIds would be ambiguous
    // inside a custom binary node (the analyzer's DeduplicateRelations does
    // this for built-in joins). Aliases mint fresh exprIds.
    import org.apache.spark.sql.functions.col
    val rightFresh = right.select(right.columns.toSeq.map(c => col(c).as(s"__r_$c")): _*)
    val lPlan = org.apache.spark.sql.graftbridge.analyzedPlan(left)
    val rPlan = org.apache.spark.sql.graftbridge.analyzedPlan(rightFresh)
    def attr(plan: LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw graft.types.AttributeMissing(name))
    // bind-time type checks (the engine's GraftError contract): the merge
    // compares keys/times with orderings built from the LEFT types
    val (lk, rk) = (attr(lPlan, leftKey), attr(rPlan, s"__r_$rightKey"))
    val (lt, rt) = (attr(lPlan, leftTime), attr(rPlan, s"__r_$rightTime"))
    if (lk.dataType != rk.dataType)
      throw graft.types.AttributeTypeMismatch(rightKey, lk.dataType, rk.dataType)
    if (lt.dataType != rt.dataType)
      throw graft.types.AttributeTypeMismatch(rightTime, lt.dataType, rt.dataType)
    val plan = AsOfJoinPlan(lPlan, rPlan, lk, rk, lt, rt,
      rightValues.map(v => attr(rPlan, s"__r_$v")), attr(rPlan, s"__r_$rightTiebreak"))
    val out = org.apache.spark.sql.graftbridge.ofRows(spark, plan)
    // restore public names: asof___r_<v> → asof_<v>
    val restored = left.columns.toSeq.map(col) ++
      rightValues.map(v => col(s"asof___r_$v").as(s"asof_$v")) :+ col("asof_time")
    out.select(restored: _*)
  }
}
