package graft.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a single mergeable aggregate: at most
  * `k` counters; a miss when full decrements every counter (dropping zeros),
  * so any item with true frequency > N/(k+1) is guaranteed to survive and
  * every surviving estimate under-counts by at most N/(k+1).
  *
  * Merge (partial → final) follows the mergeable-summaries construction:
  * sum both counter sets, then subtract the (k+1)-th largest count from all
  * and drop non-positives — the N/(k+1) error bound composes across merges,
  * which is exactly what makes this a one-shuffle top-k-candidates pass over
  * a 100 TB corpus (the alternative, an exact groupBy over every term, is a
  * full-vocabulary shuffle). When `k` is at least the true distinct count the
  * decrement path never fires and the sketch IS the exact count map — the
  * q87 gate pins that exactness on the fixture's 31-word vocabulary while
  * MisraGriesSpec exercises the lossy regime.
  *
  * Reference scope: dbkit has no aggregate layer (roadmap item,
  * /root/reference/README.md:31-38); this is the §2.9 custom-aggregate tier
  * applied to the §2.11 corpus-statistics family.
  */
case class MisraGriesAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, s"capacity k must be >= 1 (got $k)")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // getString copies out of the (possibly reused) UnsafeRow buffer, so
      // the key is safe to retain across rows
      val t = v.asInstanceOf[UTF8String].toString
      buf.get(t) match {
        case Some(c) => buf.update(t, c + 1L)
        case None if buf.size < k => buf.update(t, 1L)
        case None =>
          // full + miss: decrement all, drop zeros (snapshot keys first —
          // mutating a HashMap while iterating it is undefined)
          val keys = buf.keysIterator.toArray
          var i = 0
          while (i < keys.length) {
            val c = buf(keys(i))
            if (c == 1L) buf.remove(keys(i)) else buf.update(keys(i), c - 1L)
            i += 1
          }
      }
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from everything, drop <= 0
      val d = a.values.toArray.sortInPlace()(Ordering.Long.reverse).apply(k)
      val keys = a.keysIterator.toArray
      var i = 0
      while (i < keys.length) {
        val c = a(keys(i)) - d
        if (c <= 0L) a.remove(keys(i)) else a.update(keys(i), c)
        i += 1
      }
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // sort by key: HashMap iteration order must never leak into the output
    val entries = buf.toArray.sortInPlace()(Ordering.by((e: (String, Long)) => e._1))
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1): Any)),
      new GenericArrayData(entries.map(e => e._2: Any)))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val items = buf.toArray
    val byteArrays = items.map(e => e._1.getBytes(StandardCharsets.UTF_8))
    val size = 4 + byteArrays.map(b => 4 + b.length + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(items.length)
    var i = 0
    while (i < items.length) {
      bb.putInt(byteArrays(i).length)
      bb.put(byteArrays(i))
      bb.putLong(items(i)._2)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val strBytes = new Array[Byte](len)
      bb.get(strBytes)
      m.update(new String(strBytes, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAggregate =
    copy(child = newChildren.head)
}

object MisraGriesAggregate {
  /** `misra_gries(term, k)`: map<string,long> of at most k surviving
    * (item, estimate) counters; estimates under-count by at most N/(k+1).
    */
  def apply(term: Column, k: Int): Column =
    org.apache.spark.sql.graftbridge.toColumn(
      MisraGriesAggregate(org.apache.spark.sql.graftbridge.toExpression(term), k)
        .toAggregateExpression())
}
