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

/** Confusable-skeleton normalization — the homoglyph layer of text
  * dedup: spam and dedup-evasion rewrite documents by swapping Latin
  * letters for visually identical Cyrillic/Greek codepoints, widening
  * to fullwidth forms, and salting with zero-width characters, so
  * byte-level and even NFC-normalized hashing sees unrelated strings.
  * The skeleton folds a 1:1 subset of the public Unicode confusables
  * table (the pairs that survive `lower()`) and deletes zero-width
  * characters, all through one codegen'd `translate` — no UDF, no
  * regex, scan-shaped at any corpus size. */
object ConfusableSkeleton {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{lower, translate}

  // Cyrillic lowercase lookalikes (each survives lower()):
  // a e o p c x y i s d q w
  private val CyrFrom = "\u0430\u0435\u043e\u0440\u0441\u0445" +
    "\u0443\u0456\u0455\u0501\u051b\u051d"
  private val CyrTo = "aeopcxyisdqw"
  // Greek lowercase lookalikes: omicron -> o, nu -> v
  private val GreekFrom = "\u03bf\u03bd"
  private val GreekTo = "ov"
  // Fullwidth ASCII letters and digits
  private val FwFrom =
    ('\uff41' to '\uff5a').mkString + ('\uff10' to '\uff19').mkString
  private val FwTo = ('a' to 'z').mkString + ('0' to '9').mkString
  // NBSP folds to space; zero-width characters (listed past the end of
  // the `to` string) are DELETED by translate
  private val From = CyrFrom + GreekFrom + FwFrom + "\u00a0" +
    "\u200b\u200c\u200d\ufeff"
  private val To = CyrTo + GreekTo + FwTo + " "

  /** Case-folded confusable skeleton of a string column. */
  def skeleton(c: Column): Column = translate(lower(c), From, To)
}
