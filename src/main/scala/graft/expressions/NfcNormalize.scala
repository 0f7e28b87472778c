package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization (UAX #15) — the
  * canonical first step of web-scale text curation (crawled text mixes
  * precomposed and combining-mark encodings of the same grapheme, so
  * dedup/shingle/equality operators see spurious differences until the
  * corpus is canonicalized). Cross-engine exact: the JDK's
  * `java.text.Normalizer` and DuckDB's `nfc_normalize` both implement
  * UAX #15, so normalized bytes gate bit-for-bit (q178).
  *
  * Same extension tier as [[CosineSimilarity]] (SURVEY.md §2.9, reference
  * src/expression/mod.rs:23-38): a codegen'd Expression, not a UDF — the
  * call fuses into WholeStageCodegen with no Row boxing.
  *
  * 100 TB design note: the hot path is the ASCII FAST PATH. Web corpora
  * are predominantly ASCII; an ASCII string is NFC by definition and is
  * returned as-is WITHOUT materializing a java.lang.String (numBytes ==
  * numChars detects pure-ASCII UTF-8 — any multi-byte codepoint makes
  * bytes exceed chars). Already-normalized non-ASCII strings take the
  * `isNormalized` check (one pass, no allocation); only strings that
  * actually change pay the normalize + re-encode cost.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string input, got ${t.simpleString}")
  }

  override def dataType: DataType = child.dataType

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static kernel shared by interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    // pure ASCII ⇒ already NFC; skip the String round-trip entirely
    if (s.numBytes == s.numChars) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-API entry point (classic-mode Column↔Expression bridge). */
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.toColumn(
      NfcNormalize(org.apache.spark.sql.graftbridge.toExpression(c)))
}
