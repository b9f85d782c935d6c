package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic text canonicalization for dedup/fingerprint pipelines:
  * Unicode NFC normalization + ASCII-only lowercasing + ASCII-whitespace
  * run collapse + trim, as ONE codegen'd expression.
  *
  * Exactly this composition and nothing more, because every piece has a
  * bit-identical DuckDB replay (`nfc_normalize` ∘ `translate(A-Z, a-z)` ∘
  * `regexp_replace('[ \t\n\r\f]+', ' ', 'g')` ∘ `trim(' ')`):
  *   - NFC is the Unicode-standard canonical composition — the JDK's
  *     `java.text.Normalizer` and DuckDB's utf8proc produce identical
  *     output for assigned codepoints (checked against hostile cases:
  *     combining marks, Hangul jamo, compatibility ligatures left alone).
  *   - Lowercasing is restricted to A-Z: full Unicode case folding is
  *     locale- and version-dependent (dotted-I, final sigma, ß) and NOT
  *     engine-portable; dedup canonicalization needs determinism more
  *     than linguistic completeness.
  *   - Whitespace is the explicit ASCII class [ \t\n\r\f] — `\s` means
  *     different sets to different regex engines.
  *
  * Canonicalize-then-hash is the standard pre-dedup step (trailing
  * whitespace or decomposed accents must not defeat exact/minhash
  * dedup); keeping it native keeps the hot path in whole-stage codegen.
  */
case class NormText(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "norm_text"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"norm_text expects string, got ${other.sql}")
    }

  override protected def nullSafeEval(v: Any): Any =
    NormText.norm(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormText.norm($c)")

  override protected def withNewChildInternal(newChild: Expression): NormText =
    copy(child = newChild)
}

object NormText {

  /** codegen entry point */
  def norm(s: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer
      .normalize(s.toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var i = 0
    var pendingSpace = false
    while (i < nfc.length) {
      val c = nfc.charAt(i)
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'
      if (isWs) pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def apply(c: Column): Column =
    graftshim.column(NormText(graftshim.expression(c)))
}
