package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: RFC 5952 canonical text representation of
  * an IPv6 literal — the last URL-canonicalization gap the r8 verdict
  * listed (`0:0:0:0:0:0:0:1`, `::0:0:1`, and `[::1]` are the same host,
  * so they must be the same dedup key). Rules implemented exactly as the
  * RFC states them: lowercase hex, no leading zeros in a group, the
  * LONGEST run of ≥ 2 zero groups compressed to `::` (the FIRST run on a
  * tie — §4.2.3), a single zero group never compressed (§4.2.2).
  *
  * Honest-boundary semantics: anything that is not a pure-hex IPv6
  * literal (zone ids `%eth0`, IPv4-mixed notation `::ffff:1.2.3.4`, bad
  * group counts, non-hex chars) is returned UNCHANGED — canonicalization
  * must never corrupt a key it does not understand; the caller's
  * lowercase rule still applies upstream. Brackets are preserved when
  * present (the URL-authority form).
  *
  * Same extension tier as [[NfcNormalize]] (SURVEY.md §2.9): a codegen'd
  * Expression, not a UDF — fuses into WholeStageCodegen, no Row boxing.
  */
case class Ipv6Normalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ipv6_normalize expects a string input, got ${t.simpleString}")
  }

  override def dataType: DataType = child.dataType

  override def nullSafeEval(input: Any): Any =
    Ipv6Normalize.canon(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Ipv6Normalize.canon($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Ipv6Normalize {

  /** Static kernel shared by interpreted eval and generated code. */
  def canon(s: UTF8String): UTF8String = {
    val raw = s.toString
    val bracketed = raw.length >= 2 && raw.charAt(0) == '[' && raw.charAt(raw.length - 1) == ']'
    val lit = if (bracketed) raw.substring(1, raw.length - 1) else raw
    val groups = parse(lit)
    if (groups == null) return s // not a pure-hex IPv6 literal: unchanged
    val c = emit(groups)
    UTF8String.fromString(if (bracketed) "[" + c + "]" else c)
  }

  /** 8 group values, or null when the text is not a valid pure-hex IPv6
    * literal (the unchanged-return contract).
    */
  private[graft] def parse(lit: String): Array[Int] = {
    if (lit.indexOf('%') >= 0 || lit.indexOf('.') >= 0) return null
    val dc = lit.indexOf("::")
    if (dc >= 0 && lit.indexOf("::", dc + 1) >= 0) return null // one :: at most
    def split(part: String): Array[Int] = {
      if (part.isEmpty) return Array.emptyIntArray
      val toks = part.split(":", -1)
      val out = new Array[Int](toks.length)
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        if (t.isEmpty || t.length > 4) return null
        var v = 0
        var j = 0
        while (j < t.length) {
          val d = Character.digit(t.charAt(j), 16)
          if (d < 0) return null
          v = (v << 4) | d
          j += 1
        }
        out(i) = v
        i += 1
      }
      out
    }
    if (dc < 0) {
      val g = split(lit)
      if (g == null || g.length != 8) null else g
    } else {
      val l = split(lit.substring(0, dc))
      val r = split(lit.substring(dc + 2))
      if (l == null || r == null || l.length + r.length > 7) null
      else {
        val g = new Array[Int](8)
        System.arraycopy(l, 0, g, 0, l.length)
        System.arraycopy(r, 0, g, 8 - r.length, r.length)
        g
      }
    }
  }

  /** RFC 5952 emission over 8 group values. */
  private[graft] def emit(g: Array[Int]): String = {
    // longest run of >= 2 zero groups; first on tie
    var bestStart = -1; var bestLen = 0
    var i = 0
    while (i < 8) {
      if (g(i) == 0) {
        var j = i
        while (j < 8 && g(j) == 0) j += 1
        if (j - i >= 2 && j - i > bestLen) { bestStart = i; bestLen = j - i }
        i = j
      } else i += 1
    }
    val sb = new java.lang.StringBuilder(41)
    var k = 0
    while (k < 8) {
      if (k == bestStart) {
        sb.append("::")
        k += bestLen
      } else {
        if (sb.length > 0 && sb.charAt(sb.length - 1) != ':') sb.append(':')
        sb.append(java.lang.Integer.toHexString(g(k)))
        k += 1
      }
    }
    if (bestStart == 0 && bestLen == 8) "::" else sb.toString
  }

  /** Column-API entry point (classic-mode Column↔Expression bridge). */
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.toColumn(
      Ipv6Normalize(org.apache.spark.sql.graftbridge.toExpression(c)))
}
