package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** PII detection and redaction for training corpora: emails, phone
  * numbers, and IPv4 addresses replaced with typed placeholder tokens.
  *
  * Pure per-row regexp expressions — shuffle-free, scan-bound, inside
  * whole-stage codegen. Patterns are deliberately RE2-safe (no
  * lookaround, no backreferences) so the exact same pattern strings run
  * in Spark (java.util.regex) and the DuckDB oracle (RE2) with identical
  * semantics.
  *
  * The corpus documents contain no natural PII, so the oracle query
  * plants deterministic PII derived from doc_id before scrubbing —
  * exercising both the detector (counts) and the redactor (hashes).
  */
object PiiScrub {

  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Count matches of `pattern` in `c`. */
  def piiCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  /** Redact all three PII classes with typed placeholders. Order matters:
    * IPs before phones would not collide here, but apply email → phone →
    * ip consistently everywhere. */
  def scrub(c: Column): Column = {
    val e = regexp_replace(c, EmailRe, "<EMAIL>")
    val p = regexp_replace(e, PhoneRe, "<PHONE>")
    regexp_replace(p, Ipv4Re, "<IP>")
  }

  /** Query: plant deterministic PII into each document, then detect and
    * redact it. Output proves detection counts and redaction stability
    * (md5 of the scrubbed text). */
  def query(spark: SparkSession, dir: String): DataFrame = {
    val planted = Tables.documents(spark, dir).select(
      col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com or 555-123-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit(".7")
      ).as("text"))
    planted.select(
      col("doc_id"),
      piiCount(col("text"), EmailRe).as("n_emails"),
      piiCount(col("text"), PhoneRe).as("n_phones"),
      piiCount(col("text"), Ipv4Re).as("n_ips"),
      md5(scrub(col("text"))).as("scrubbed_md5"))
  }

  val oracle: String =
    s"""WITH planted AS (
       |  SELECT doc_id,
       |         text || ' contact user' || doc_id || '@example.com or 555-123-' ||
       |         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
       |         ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS text
       |  FROM documents)
       |SELECT doc_id,
       |       CAST(len(regexp_extract_all(text, '$EmailRe')) AS INT) AS n_emails,
       |       CAST(len(regexp_extract_all(text, '$PhoneRe')) AS INT) AS n_phones,
       |       CAST(len(regexp_extract_all(text, '$Ipv4Re')) AS INT) AS n_ips,
       |       md5(regexp_replace(regexp_replace(regexp_replace(text,
       |            '$EmailRe', '<EMAIL>', 'g'),
       |            '$PhoneRe', '<PHONE>', 'g'),
       |            '$Ipv4Re', '<IP>', 'g')) AS scrubbed_md5
       |FROM planted
       |""".stripMargin
}
