package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** MinHash signature as ONE aggregate: buffer = k running minima, update =
  * k affine permutations of the (pre-hashed, pre-mod) input in plain JVM
  * code, merge = element-wise min.
  *
  * Why not k separate `min(...)` aggregate expressions? They work (and are
  * the oracle-validated reference shape), but codegen then emits k update
  * paths into one giant HashAggregate method — at k=64 the janino compile
  * dominates cold-query latency. A TypedImperativeAggregate keeps the
  * generated code O(1) and runs the k-step loop as bytecode; the buffer ships
  * partial→final exactly like any built-in agg (this is the
  * TypedImperativeAggregate tier of SURVEY.md §2.9, appropriate because the
  * aggregate is decomposable but not expressible compactly in expressions).
  */
case class MinHashAggregate(
    child: Expression,
    seedsA: Seq[Long],
    seedsB: Seq[Long],
    prime: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val k = seedsA.length
  // overflow bound: update computes seedsA(j)*h with h < prime; both factors
  // must stay below 2^31 so the product fits in a Long (a 61-bit prime — the
  // other common MinHash modulus — would wrap negative and poison the minima)
  require(prime < (1L << 31), s"prime must be < 2^31 (got $prime)")
  require(seedsA.forall(a => a > 0 && a < prime),
    "multiplier seeds (a) must lie in (0, prime) — a=0 would collapse a hash to its offset")
  require(seedsB.forall(b => b >= 0 && b < prime),
    "offset seeds (b) must lie in [0, prime)")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(prime)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] // caller pre-reduces: 0 <= h < prime
      var j = 0
      while (j < k) {
        val p = (seedsA(j) * h + seedsB(j)) % prime
        if (p < buf(j)) buf(j) = p
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAggregate =
    copy(child = newChildren.head)
}

object MinHashAggregate {
  def apply(h: Column, seedsA: Seq[Long], seedsB: Seq[Long], prime: Long): Column =
    org.apache.spark.sql.graftbridge.toColumn(
      MinHashAggregate(org.apache.spark.sql.graftbridge.toExpression(h),
        seedsA, seedsB, prime).toAggregateExpression())
}
