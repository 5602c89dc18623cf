package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit TF-weighted SimHash of a text column in one native pass.
  *
  * Value-identical to the composed formulation (tokens = whitespace split
  * of the space-trimmed lower-cased text; per token OCCURRENCE hash =
  * first 15 md5 hex digits; bit j of the output = sign of
  * Σ ±1 votes from bit j of each token hash) — the oracle SQL is
  * unchanged. The composed plan explodes one row per token and runs a
  * 60-column hash aggregation; this walks the tokens once per document
  * with a 60-counter array, no explode, no shuffle.
  */
case class SimHash60(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    var start = 0
    var end = text.length
    while (start < end && text.charAt(start) == ' ') start += 1
    while (end > start && text.charAt(end - 1) == ' ') end -= 1
    val tokens = text.substring(start, end)
      .toLowerCase(java.util.Locale.ROOT).split("\\s+")

    val md = MessageDigest.getInstance("MD5")
    val votes = new Array[Long](60)
    var t = 0
    while (t < tokens.length) {
      md.reset()
      val d = md.digest(tokens(t).getBytes(StandardCharsets.UTF_8))
      var v = 0L
      var k = 0
      while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
      val h = v >>> 4
      var j = 0
      while (j < 60) {
        votes(j) += (((h >>> j) & 1L) * 2L) - 1L
        j += 1
      }
      t += 1
    }
    var sim = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) >= 0) sim |= 1L << j
      j += 1
    }
    sim
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}
