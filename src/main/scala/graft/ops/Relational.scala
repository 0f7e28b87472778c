package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Thin relational-operator surface over DataFrames (SURVEY.md §2.3–2.7).
  *
  * The reference declares "relational algebra / calculus operators" as its
  * scope (reference README.md:13-14) but implements only ScanView + Project;
  * everything here is the capability-completion layer, expressed declaratively
  * so Catalyst keeps predicate pushdown / column pruning / join selection.
  *
  * Scale notes are attached per-operator: which side to broadcast, where the
  * shuffle lands, what AQE fixes at runtime.
  */
object Relational {

  implicit final class GraftDataFrameOps(private val df: DataFrame) extends AnyVal {

    /** Selection (σ). Declarative so the predicate is pushed into the scan. */
    def sel(cond: Column): DataFrame = df.filter(cond)

    /** Projection (π) via the projector DSL. */
    def proj(p: SingleSourceProjector): DataFrame = p(df)

    /** Equi-join on shared key names. Shuffles both sides on the key at scale
      * unless one side is broadcast-able; callers with a dimension table
      * should use [[broadcastJoin]].
      */
    def equiJoin(right: DataFrame, keys: Seq[String], joinType: String = "inner"): DataFrame =
      df.join(right, keys, joinType)

    /** Broadcast hash join — the reference anticipates an always-alive build
      * side "useful for things like join with Tiny"
      * (reference src/util/copy_value.rs:101-102). At 100 TB the fact side
      * never shuffles; the dim ships to every executor once.
      */
    def broadcastJoin(dim: DataFrame, keys: Seq[String], joinType: String = "inner"): DataFrame =
      df.join(broadcast(dim), keys, joinType)

    def semiJoin(right: DataFrame, keys: Seq[String]): DataFrame =
      df.join(right, keys, "left_semi")

    def antiJoin(right: DataFrame, keys: Seq[String]): DataFrame =
      df.join(right, keys, "left_anti")

    /** Theta join (arbitrary condition). Plans to BroadcastNestedLoopJoin when
      * one side is small; at scale prefer adding an equi conjunct or banding
      * the range so the planner can hash-partition.
      */
    def thetaJoin(right: DataFrame, cond: Column, joinType: String = "inner"): DataFrame =
      df.join(right, cond, joinType)

    /** Top-k: planner emits TakeOrderedAndProject — per-partition heap of k,
      * then a k-sized merge on the driver; no global sort at any scale.
      */
    def topK(k: Int, order: Column*): DataFrame = df.orderBy(order: _*).limit(k)
  }
}
