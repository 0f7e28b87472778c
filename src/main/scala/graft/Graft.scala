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

  /** Idempotently install on a live session. */
  def install(spark: SparkSession): Unit = {
    AsOfStrategy.register(spark) // registers the strategy AND its optimizer rule
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => cosineSimDescriptor._3(exprs),
      "built-in")
  }
}
