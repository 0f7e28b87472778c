package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import graft.expressions.CosineSimilarity
import graft.plans.AsOfStrategy

/** Engine installation: wires graft's custom pieces into a SparkSession.
  *
  * Two entry points for the two ownership models:
  *  - [[GraftExtensions]]: builder-time, for sessions you construct —
  *    `SparkSession.builder().withExtensions(new GraftExtensions)` (or
  *    `spark.sql.extensions=graft.GraftExtensions`).
  *  - [[Graft.install]]: runtime, for sessions handed to you (the driver
  *    contract passes one in) — registers the planner strategy and SQL
  *    functions on the live session.
  *
  * After either, SQL can call `cosine_sim(a, b)` and the as-of join plans
  * through [[graft.plans.AsOfJoinExec]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfStrategy)
    e.injectOptimizerRule(_ => graft.plans.PushLeftFilterThroughAsOf)
    e.injectFunction(Graft.cosineSimDescriptor)
    e.injectFunction(Graft.misraGriesDescriptor)
  }
}

object Graft {

  private[graft] val cosineSimDescriptor = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.size == 2, "cosine_sim(a, b) takes two array<float> args")
      CosineSimilarity(children(0), children(1))
    })

  private[graft] val misraGriesDescriptor = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("misra_gries"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[graft.expressions.MisraGriesAggregate].getName, "misra_gries"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.size == 2, "misra_gries(item, k) takes two args")
      // k shapes the aggregation buffer, so it must be a plan-time constant
      val k = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
            org.apache.spark.sql.types.IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"misra_gries k must be an integer literal, got $other")
      }
      // return the bare AggregateFunction: the analyzer wraps it in an
      // AggregateExpression exactly as for built-in aggregates
      graft.expressions.MisraGriesAggregate(children(0), k)
    })

  /** Idempotently install on a live session. */
  def install(spark: SparkSession): Unit = {
    AsOfStrategy.register(spark) // registers the strategy AND its optimizer rule
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => cosineSimDescriptor._3(exprs),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "misra_gries",
      exprs => misraGriesDescriptor._3(exprs),
      "built-in")
  }
}
