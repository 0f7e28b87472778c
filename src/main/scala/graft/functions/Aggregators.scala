package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom aggregate surface (SURVEY.md §2.9): the engine's UDAF tier is
  * `Aggregator[IN, BUF, OUT]` — typed, mergeable (associative partial
  * aggregation, so it parallelizes like any built-in agg at 100 TB).
  */
object Aggregators {

  /** Buffer for [[VectorCentroid]]: dim-wise double sums + row count. */
  case class CentroidBuf(sums: Array[Double], n: Long)

  /** Element-wise vector mean (centroid) of an embedding column. The buffer
    * merge is element-wise addition — exactly the decomposable shape
    * HashAggregate partial/final needs, so the shuffle carries one
    * (dims+1)-wide buffer per group per partition, never the vectors.
    */
  class VectorCentroid(dims: Int)
      extends Aggregator[Seq[Float], CentroidBuf, Seq[Double]] {
    override def zero: CentroidBuf = CentroidBuf(Array.fill(dims)(0.0), 0L)
    override def reduce(b: CentroidBuf, v: Seq[Float]): CentroidBuf = {
      // null or wrong-arity vectors are skipped entirely (counting them
      // would silently drag missing dimensions toward 0)
      if (v == null || v.length != dims) return b
      var i = 0
      while (i < dims) { b.sums(i) += v(i); i += 1 }
      CentroidBuf(b.sums, b.n + 1)
    }
    override def merge(x: CentroidBuf, y: CentroidBuf): CentroidBuf = {
      var i = 0
      while (i < dims) { x.sums(i) += y.sums(i); i += 1 }
      CentroidBuf(x.sums, x.n + y.n)
    }
    override def finish(b: CentroidBuf): Seq[Double] =
      if (b.n == 0) Seq.empty else b.sums.map(_ / b.n).toSeq
    override def bufferEncoder: Encoder[CentroidBuf] = ExpressionEncoder[CentroidBuf]()
    override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  /** Column-API centroid aggregate over an array<float> column. */
  def vectorCentroid(vec: Column, dims: Int): Column =
    udaf(new VectorCentroid(dims), ExpressionEncoder[Seq[Float]]()).apply(vec)
}
