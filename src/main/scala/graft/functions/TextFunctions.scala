package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, word-shingling, portable hashing, language-ID profiles.
  *
  * Everything here is a Catalyst built-in composition (no UDFs), so each
  * function stays inside whole-stage codegen and is usable in any query
  * position. Hashes are built on `md5` specifically because it is
  * bit-identical across engines (Spark, DuckDB, Postgres), which makes every
  * operator in this module oracle-checkable; xxhash64/murmur3 are
  * engine-specific.
  */
object TextFunctions {

  /** Whitespace tokens of the lower-cased, trimmed text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** "BPE-ish" subword-shaped token count: letter runs, digit runs, and
    * single punctuation marks each count as one token. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Distinct word n-gram shingles as "w1 w2 … wn" strings. Documents
    * shorter than n shingle to an empty array (never a negative-range
    * sequence). */
  def shingles(toks: Column, n: Int): Column = {
    val sh = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", slice(toks, i, lit(n))))
    when(size(toks) >= n, array_distinct(sh))
      .otherwise(typedLit(Array.empty[String]))
  }

  /** 60-bit portable hash: first 15 hex digits of md5, parsed base-16.
    * Positive in a signed long on every engine; DuckDB equivalent:
    * `CAST(('0x' || substr(md5(x), 1, 15)) AS UBIGINT)`. */
  def hash60(c: Column): Column =
    conv(substr(md5(c), lit(1), lit(15)), 16, 10).cast(LongType)

  /** Fraction of `toks` that appear in the (small, broadcast-as-literal)
    * vocabulary `words`. Empty-token guard: size 0 → 0.0. */
  def vocabRatio(toks: Column, words: Seq[String]): Column = {
    val hits = size(filter(toks, t => array_contains(typedLit(words), t)))
    when(size(toks) > 0, hits.cast("double") / size(toks)).otherwise(lit(0.0))
  }

  /** Tiny per-language function-word profiles for n-gram-free language ID.
    * Ordered alphabetically; ties in score resolve to the earliest entry.
    * Profiles are intentionally disjoint so scores don't cross-talk. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "es" -> Seq("el", "los", "y", "es", "un", "una", "que"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans", "je"),
    "zh" -> Seq("的", "是", "在", "了", "我", "不", "人"))

  /** Sum of token lengths (for average-token-length metrics). */
  def tokenLenSum(toks: Column): Column =
    aggregate(transform(toks, t => length(t)), lit(0), (acc, x) => acc + x)
}
