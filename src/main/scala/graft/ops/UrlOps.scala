package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** URL canonicalization + dedup — the step every crawl pipeline runs
  * before anything touches document content: the same page is fetched
  * as `HTTP://Example.COM:80/a/?utm_source=x&b=2&a=1#frag`,
  * `http://example.com/a?a=1&b=2&utm_campaign=y`, and
  * `http://example.com:80/a/?b=2&a=1`, and byte-level URL matching
  * sees three distinct pages (wasted re-crawls, duplicate documents,
  * leaked train/test splits).
  *
  * Canonical form (RFC 3986 §6 normalization plus the standard crawl
  * conventions): lowercase scheme and authority, default port
  * stripped (`:80` http / `:443` https), fragment dropped, trailing
  * path slash collapsed (empty path → `/`), tracking parameters
  * removed (`utm_*`, `gclid`, `fbclid`), remaining query parameters
  * sorted. Percent-encoding case and dot-segment normalization are
  * out of scope (documented; they need a decoder loop, not a
  * projection).
  *
  * Everything is a pure column expression — regexp extracts plus
  * array higher-order functions, zero UDFs, shuffle-free until the
  * final survivor aggregation — so Catalyst fuses the whole
  * canonicalization into one codegen'd projection over the scan. At
  * 100 TB this is a map-only pass followed by one hash aggregation on
  * the canonical key.
  */
object UrlOps {

  /** Canonicalize one URL column (see object doc for the rules). */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    // scheme://authority — lowercased, default ports stripped
    val head0 = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1))
    val head = regexp_replace(
      regexp_replace(head0, "^(http://.*):80$", "$1"),
      "^(https://.*):443$", "$1")
    // path[?query] — everything after the authority
    val tail = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    val path0 = regexp_extract(tail, "^([^?]*)", 1)
    val path = {
      val stripped = regexp_replace(path0, "/+$", "")
      when(stripped === "", lit("/")).otherwise(stripped)
    }
    val query = regexp_extract(tail, "\\?(.*)$", 1)
    val params = filter(split(query, "&"), p =>
      !p.rlike("^(utm_[^=]*|gclid|fbclid)=") && p =!= "")
    val sortedQ = array_join(array_sort(params), "&")
    concat(head, path,
      when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ)))
  }

  /** Deterministic messy-URL fixture: docs arrive in groups of three
    * (`doc_id div 3` is the page), each carrying a DIFFERENT messy
    * rendering of the same page URL — uppercase scheme/host + default
    * port + tracking param + fragment; reordered params + a different
    * tracker; default port + trailing slash + reordered params. */
  private def messyUrl(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val grp = expr("doc_id DIV 3") // integer division, no double round-trip
    val g7 = (grp % 7).cast("string")
    val gs = grp.cast("string")
    val v = col("doc_id") % 3
    docs.withColumn("url",
      when(v === 0, concat(lit("HTTP://WWW.Example"), g7, lit(".COM:80/p/"),
        gs, lit("/?utm_source=x&b=2&a=1#frag")))
      .when(v === 1, concat(lit("http://www.example"), g7, lit(".com/p/"),
        gs, lit("?a=1&b=2&utm_campaign=y")))
      .otherwise(concat(lit("http://www.example"), g7, lit(".com:80/p/"),
        gs, lit("/?b=2&a=1"))))
  }

  /** URL dedup: canonicalize every messy URL in-plan, group on the
    * canonical form, keep the earliest fetch as survivor. The oracle
    * predicts the canonical strings by formula — an independent
    * derivation, so any canonicalization bug (missed port, unsorted
    * params, surviving tracker) breaks the hash compare. */
  def urlDedupQuery(spark: SparkSession, dir: String): DataFrame =
    messyUrl(spark, dir)
      .withColumn("canonical_url", canonicalizeUrl(col("url")))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("survivor_doc_id"))

  val urlDedupOracle: String =
    """SELECT 'http://www.example' || CAST((doc_id // 3) % 7 AS VARCHAR) ||
      |       '.com/p/' || CAST(doc_id // 3 AS VARCHAR) || '?a=1&b=2'
      |         AS canonical_url,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       min(doc_id) AS survivor_doc_id
      |FROM documents
      |GROUP BY 1
      |""".stripMargin

  /** Per-domain document caps — the RefinedWeb/C4-style guard against
    * any single host dominating the corpus: canonical domain → total
    * fetched, kept under the cap (first `cap` doc_ids per domain), and
    * the share dropped. Domains are LOW-cardinality (sites, not
    * pages), so the per-domain aggregate is a small shuffle and the
    * kept-set selection broadcasts nothing document-sized. */
  def urlDomainCapQuery(spark: SparkSession, dir: String,
                        cap: Long = 50): DataFrame =
    messyUrl(spark, dir)
      .withColumn("canonical_url", canonicalizeUrl(col("url")))
      .withColumn("domain", regexp_extract(col("canonical_url"),
        "^[a-z][a-z0-9+.-]*://([^/:?#]*)", 1))
      .withColumn("rank_in_domain",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("domain")).orderBy(col("doc_id"))))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_total"),
        count(when(col("rank_in_domain") <= cap, lit(1))).as("n_kept"))

  val urlDomainCapOracle: String =
    """SELECT 'www.example' || CAST((doc_id // 3) % 7 AS VARCHAR) || '.com'
      |         AS domain,
      |       CAST(count(*) AS BIGINT) AS n_total,
      |       CAST(least(count(*), 50) AS BIGINT) AS n_kept
      |FROM documents
      |GROUP BY 1
      |""".stripMargin
}
