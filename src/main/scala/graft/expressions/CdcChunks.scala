package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: content-defined chunking (the FastCDC
  * gear-hash shape, q223) — a chunk boundary falls after codepoint
  * position i iff the base-131 Horner hash of the 8-codepoint window
  * ending at i, REDUCED mod 61 at every step, is 0. Semantics are
  * bit-identical to the higher-order-builtin composition this replaces
  * (same boundary law, same codepoint substrings, empty text → empty
  * array), and the q223 DuckDB oracle replays it unchanged.
  *
  * WHY a native expression instead of the filter/transform builtins:
  * higher-order functions are CodegenFallback — their hot loop runs on
  * the SHARED interpreted eval path (BinaryArithmetic.eval,
  * ArrayTransform.eval), whose JIT state is polluted by every other
  * query in a long session. Measured in the r9 close: the same q223
  * plan ran 2.2 s in one full-suite JVM and a FLAT 22 s in another
  * (stack-sampled live: all workers inside Remainder.eval /
  * SimpleHigherOrderFunction.eval — megamorphic call sites that C2
  * sometimes never recovers), while in isolation it always ran 2.2 s.
  * This kernel is one tight primitive long-arithmetic loop per
  * document, fused into whole-stage codegen — immune to expression-eval
  * profile state, and ~an order of magnitude faster even in the good
  * mode (no per-element expression dispatch, no boxed sequence/filter
  * arrays).
  *
  * 100 TB note: O(8·len) integer work per document, zero allocation
  * beyond the output strings and two int arrays; map-side at the scan.
  */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects a string input, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CdcChunks.split(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.CdcChunks.split($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunks {

  val Base = 131L
  val Mod = 61L
  val Window = 8

  /** Static kernel shared by interpreted eval and generated code. */
  def split(s: UTF8String): ArrayData = {
    val str = s.toString
    if (str.isEmpty) return new GenericArrayData(Array.empty[Any])
    val cps = str.codePoints().toArray
    val n = cps.length
    // charOff(k) = UTF-16 offset of codepoint k (astral chars are 2 units)
    val charOff = new Array[Int](n + 1)
    var ci = 0
    var k = 0
    while (k < n) { charOff(k) = ci; ci += Character.charCount(cps(k)); k += 1 }
    charOff(n) = ci
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var prev = 0
    var e = Window
    while (e <= n) {
      var acc = 0L
      var j = e - Window
      while (j < e) { acc = (acc * Base + cps(j)) % Mod; j += 1 }
      if (acc == 0L) {
        out += UTF8String.fromString(str.substring(charOff(prev), charOff(e)))
        prev = e
      }
      e += 1
    }
    if (prev < n) out += UTF8String.fromString(str.substring(charOff(prev), charOff(n)))
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry point (classic-mode Column↔Expression bridge). */
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.toColumn(
      CdcChunks(org.apache.spark.sql.graftbridge.toExpression(c)))
}
