package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{NfcName, StripAccentsName}

/** Unicode normalization expressions, proven on NON-ASCII fixtures (the
  * oracle corpus is ASCII, where normalization must be the identity).
  * Every non-ASCII code point is spelled as an explicit backslash-u
  * escape so the source file itself cannot silently change composition
  * form (scalac decodes them at compile time). */
class TextNormSpec extends SparkSpec {
  import spark.implicits._

  private val Composed = "Caf\u00e9"   // precomposed e-acute
  private val Decomposed = "Cafe\u0301" // e + combining acute U+0301

  private def nfc(s: String): String = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    Seq(s).toDF("t").select(call_function(NfcName, col("t")))
      .head().getString(0)
  }
  private def fold(s: String): String = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    Seq(s).toDF("t").select(call_function(StripAccentsName, col("t")))
      .head().getString(0)
  }

  test("NFC composes decomposed accents; composed text passes through") {
    assert(Decomposed != Composed) // distinct code points...
    assert(nfc(Decomposed) == Composed) // ...same NFC form
    assert(nfc(Composed) == Composed)
    assert(nfc("plain ascii") == "plain ascii")
  }

  test("StripAccents folds marks but keeps non-mark characters") {
    assert(fold("\u00e9cole") == "ecole")
    assert(fold("na\u00efve r\u00e9sum\u00e9") == "naive resume")
    assert(fold(Decomposed) == "Cafe") // decomposed input too
    assert(fold(Composed) == "Cafe")
    assert(fold("a \u2014 b") == "a \u2014 b") // em dash is not an accent
    assert(fold("\u65e5\u672c\u8a9e") == "\u65e5\u672c\u8a9e") // CJK untouched
    assert(fold("ascii only") == "ascii only")
  }

  test("null propagates through both expressions") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val r = Seq[Option[String]](None).toDF("t")
      .select(call_function(NfcName, col("t")),
              call_function(StripAccentsName, col("t"))).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("normalize query: composition rewrites every dirtied row") {
    // the query appends "  cafe" + combining acute to each ASCII doc, so
    // whitespace collapse AND NFC composition have real work on every row
    val rows = graft.ops.TextAnalysis.normalize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val norm = r.getString(1); val ascii = r.getString(2)
      assert(norm.endsWith(" caf\u00e9"), "decomposed suffix must compose")
      assert(ascii.endsWith(" cafe"), "fold must strip the acute")
      assert(ascii == graft.functions.StripAccents.fold(norm))
      assert(r.getInt(3) == 1, "every dirtied row must report changed")
    }
  }

  test("normalize pipeline on mixed unicode: whitespace collapse + composition") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val duoDecomposed = "du\u0301o" // u + combining acute
    val duoComposed = "d\u00fao"
    val df = Seq(
      (1L, s" $Decomposed  \t $duoDecomposed "), // decomposed + messy whitespace
      (2L, "already clean")).toDF("doc_id", "text")
    val got = df
      .withColumn("norm",
        trim(regexp_replace(call_function(NfcName, col("text")), "\\s+", " ")))
      .select(col("doc_id"), col("norm"),
        call_function(StripAccentsName, col("norm")).as("ascii_text"))
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == (s"$Composed $duoComposed", "Cafe duo"))
    assert(got(2L) == ("already clean", "already clean"))
  }
}
