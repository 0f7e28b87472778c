package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Upper-triangular Gram matrix (Σ xᵢ·xⱼ over all rows, i ≤ j) as ONE
  * aggregate over a quantized integer vector column.
  *
  * This is the 100 TB shape for X ᵀX: the naive relational spelling explodes
  * every row into d(d+1)/2 (i, j) pairs and shuffles them all — d²/2 × N
  * rows through the exchange. Here each task folds its partition into a
  * single d(d+1)/2-long buffer (map-side combine), so the shuffle carries
  * one buffer per partition regardless of N, exactly like any built-in
  * partial aggregate. The d² work per row runs as plain bytecode (the same
  * reason MinHashAggregate exists: d(d+1)/2 separate `sum(...)` expressions
  * would compile a pathological codegen stage at d = 64).
  *
  * Buffer layout: index of (i, j), i ≤ j, is `i*d − i(i−1)/2 + (j − i)` —
  * row-major upper triangle. [[GramAggregate.triIndex]] is the shared
  * mapping (the query side builds its (t → i, j) spine from it).
  *
  * Overflow: inputs are quantized to |q| ≤ Q (caller contract; the gated
  * query uses Q = 1000), so each term is ≤ Q² and the sum is exact in a
  * Long up to ~9·10¹⁸/Q² ≈ 9·10¹² rows — far past any fixture SF. Beyond
  * that, partition the input and merge DECIMAL(38,0) partials (documented,
  * not needed here).
  */
case class GramAggregate(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val tri = d * (d + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](tri)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == d,
        s"GramAggregate: expected $d-dim vector, got ${arr.numElements()}")
      // fail fast on null components: getLong on a null slot silently
      // yields garbage, corrupting every cell touching that dimension
      var c = 0
      while (c < d) {
        require(!arr.isNullAt(c), s"GramAggregate: null component at index $c")
        c += 1
      }
      var i = 0
      var t = 0
      while (i < d) {
        val qi = arr.getLong(i)
        var j = i
        while (j < d) {
          buf(t) += qi * arr.getLong(j)
          t += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var t = 0
    while (t < tri) { a(t) += b(t); t += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(tri * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(tri)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramAggregate =
    copy(child = newChildren.head)
}

object GramAggregate {
  /** Row-major upper-triangle index of (i, j), i ≤ j, for dimension d. */
  def triIndex(d: Int, i: Int, j: Int): Int = i * d - i * (i - 1) / 2 + (j - i)

  def apply(qv: Column, d: Int): Column =
    org.apache.spark.sql.graftbridge.toColumn(
      GramAggregate(org.apache.spark.sql.graftbridge.toExpression(qv), d)
        .toAggregateExpression())
}
