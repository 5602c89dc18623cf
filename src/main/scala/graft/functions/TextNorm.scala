package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization as native expressions — the canonical
  * first pass of an LLM corpus pipeline (mixed-source text arrives in
  * inconsistent composition forms, so fingerprints/shingles/dedup
  * disagree on visually identical strings until it runs).
  *
  * Spark ships no NFC/accent functions; these wrap `java.text.Normalizer`
  * behind the same expression surface as the other graft kernels. DuckDB
  * evaluates the identical semantics natively (`nfc_normalize`,
  * `strip_accents`), so the queries built on these stay hash-checkable.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // fast path: Normalizer.isNormalized is a cheap scan and almost all
    // real text (and all ASCII) is already NFC — skip the rewrite
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Accent folding: NFD-decompose, drop combining marks, leave every
  * non-mark character (dashes, quotes, CJK) untouched — DuckDB
  * `strip_accents` semantics. */
case class StripAccents(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_strip_accents"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    UTF8String.fromString(StripAccents.fold(s))
  }

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object StripAccents {
  private val Marks = java.util.regex.Pattern.compile("\\p{Mn}+")
  def fold(s: String): String = {
    // ASCII fast path: no decomposition possible
    var i = 0; var ascii = true
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) s
    else Marks.matcher(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD))
      .replaceAll("")
  }
}
