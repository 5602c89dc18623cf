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

  /** SURT (Sort-friendly URI Reordering Transform) key — the `urlkey`
    * of a Common Crawl CDX index line: canonicalize first (THE law —
    * the same [[canonicalizeUrl]] plan every URL query uses), then
    * drop the scheme, strip a leading `www.`, reverse the host labels
    * comma-joined, keep a non-default port, and append `)` before the
    * canonical path?query. `http://www.Example.COM:80/a?b=2&a=1` →
    * `com,example)/a?a=1&b=2`. Pure column expressions — codegen'd,
    * map-only at any scale. */
  def surtKey(u: Column): Column = {
    val c = canonicalizeUrl(u)
    val host = regexp_extract(c, "^[a-z][a-z0-9+.-]*://([^/?#:]*)", 1)
    val port = regexp_extract(c, "^[a-z][a-z0-9+.-]*://[^/?#]*?:(\\d+)(?:[/?#]|$)", 1)
    val rev = array_join(reverse(split(regexp_replace(host, "^www\\.", ""),
      "\\.")), ",")
    val tail = regexp_extract(c, "^[a-z][a-z0-9+.-]*://[^/?#]*(.*)$", 1)
    concat(rev,
      when(port === "", lit("")).otherwise(concat(lit(":"), port)),
      lit(")"), tail)
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

  // ------------------------------------------------- robots.txt policy

  /** Synthesized robots.txt TEXT per domain (the fixture parses real
    * file content, not pre-split rules): every domain disallows `/p`
    * but allows the longer `/public/` prefix (longest-match must win),
    * and even-numbered domains additionally disallow `/tmp/`. */
  private def robotsTxt(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 7).map { d =>
      val extra = if (d % 2 == 0) "Disallow: /tmp/\n" else ""
      (s"www.example$d.com",
        "User-agent: *\n# crawl policy\nDisallow: /p\n" +
          s"Allow: /public/\nCrawl-delay: ${1 + d % 3}\n$extra")
    }.toDF("domain", "robots")
  }

  /** Crawl-frontier URL fixture: four path sections per domain so the
    * rule table discriminates (public/ private/ tmp/ img/). */
  private def frontierUrls(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val section = element_at(
      array(lit("public"), lit("private"), lit("tmp"), lit("img")),
      (col("doc_id") % 4 + 1).cast("int"))
    docs
      .withColumn("domain",
        concat(lit("www.example"), (col("doc_id") % 7).cast("string"),
          lit(".com")))
      .withColumn("path",
        concat(lit("/"), section, lit("/"), col("doc_id").cast("string")))
  }

  /** robots.txt policy filter — the gate every polite crawler applies
    * before fetching. The robots FILES are parsed in-plan (line split,
    * Allow/Disallow extraction — zero UDFs), broadcast-joined to the
    * URL fact table (per-domain policies are dimension-sized next to a
    * 100 TB frontier), prefix-matched with RFC 9309 longest-match
    * semantics (Allow wins length ties), unmatched URLs allowed.
    * Output: per-domain allowed/denied counts. Single-group (`*`)
    * files only — agent-specific groups are out of fixture scope. */
  /** Parsed (domain, verb, rule_path) rules from the robots fixture —
    * shared by the filter and the crawl-plan composition. */
  private def robotsRules(spark: SparkSession): DataFrame =
    robotsTxt(spark)
      .select(col("domain"), posexplode(split(col("robots"), "\n")))
      .where(col("col").rlike("^(Allow|Disallow): "))
      .select(col("domain"),
        regexp_extract(col("col"), "^(Allow|Disallow): (.*)$", 1).as("verb"),
        regexp_extract(col("col"), "^(Allow|Disallow): (.*)$", 2).as("rule_path"))

  def robotsFilterQuery(spark: SparkSession, dir: String): DataFrame = {
    val rules = robotsRules(spark)
    val urls = frontierUrls(spark, dir)
    val matched = urls.join(broadcast(rules),
        urls("domain") === rules("domain") &&
          col("path").startsWith(col("rule_path")), "left")
      .select(col("doc_id"), urls("domain"),
        // longest rule wins; Allow outranks Disallow on equal length
        when(col("verb").isNull, lit(null)).otherwise(struct(
          length(col("rule_path")).as("l"),
          when(col("verb") === "Allow", 1).otherwise(0).as("a")))
          .as("m"))
      .groupBy(col("doc_id"), col("domain"))
      .agg(max(col("m")).as("best"))
      .withColumn("allowed",
        col("best").isNull || col("best.a") === 1)
    matched.groupBy("domain")
      .agg(count(when(col("allowed"), lit(1))).as("n_allowed"),
        count(when(!col("allowed"), lit(1))).as("n_denied"))
  }

  val robotsFilterOracle: String =
    """SELECT 'www.example' || CAST(doc_id % 7 AS VARCHAR) || '.com' AS domain,
      |       CAST(count(*) FILTER (WHERE
      |         doc_id % 4 = 0                             -- /public/: Allow wins
      |         OR doc_id % 4 = 3                          -- /img/: no rule
      |         OR (doc_id % 4 = 2 AND doc_id % 7 % 2 = 1) -- /tmp/ on odd domains
      |       ) AS BIGINT) AS n_allowed,
      |       CAST(count(*) FILTER (WHERE
      |         doc_id % 4 = 1                             -- /private/: Disallow /p
      |         OR (doc_id % 4 = 2 AND doc_id % 7 % 2 = 0) -- /tmp/ on even domains
      |       ) AS BIGINT) AS n_denied
      |FROM documents
      |GROUP BY 1
      |""".stripMargin

  // --------------------------------------------- redirect-chain resolve

  /** Redirect edges by formula: blocks of 8 docs; block c chains
    * positions 1..L-1 down toward head 8c (L = c%8 + 1, so chains up
    * to 7 hops); every 11th block instead has docs 8c+1 ↔ 8c+2
    * redirecting at each other (a loop) with the rest terminal. */
  private def redirectEdges(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val c = expr("doc_id DIV 8"); val p = col("doc_id") % 8
    val len = c % 8 + 1
    docs
      .withColumn("dst",
        when(c % 11 === 0,
          when(p === 1, col("doc_id") + 1)
            .when(p === 2, col("doc_id") - 1))
        .otherwise(when(p >= 1 && p < len, col("doc_id") - 1)))
      .where(col("dst").isNotNull)
      .select(col("doc_id").as("src"), col("dst"))
  }

  /** Redirect-chain resolution by POINTER DOUBLING — the web-graph
    * member of the log-round family ([[Dedup]]'s two-phase connected
    * components): each round joins the reach-2ᵏ relation with itself,
    * so 7-hop chains resolve in 3 shuffle rounds instead of 7, and at
    * 100 TB the round count stays ⌈log₂ max-hops⌉ regardless of fact
    * size. Per-round `localCheckpoint` bounds the self-join lineage
    * (the plan-blowup class the incremental-ER fix measured). Loops —
    * targets that still have outgoing edges after the rounds — are
    * reported as `loop` with NULL resolution, the crawl-side rejects
    * channel. */
  def redirectResolveQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Caches.TrackedDataset
    val edges = redirectEdges(spark, dir).trackPersist()
    var reach = edges.select(col("src"), col("dst"),
      lit(1L).as("hops"))
    var k = 0
    while (k < 3) { // 2^3 = 8 > max chain length 7
      val a = reach.as("a"); val b = reach.as("b")
      reach = a.join(b, col("a.dst") === col("b.src"), "left")
        .select(col("a.src").as("src"),
          coalesce(col("b.dst"), col("a.dst")).as("dst"),
          (col("a.hops") + coalesce(col("b.hops"), lit(0L))).as("hops"))
        .localCheckpoint()
      k += 1
    }
    val loopDst = edges.select(col("src").as("open_src")).distinct()
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    docs.join(reach, col("doc_id") === col("src"), "left")
      .join(loopDst, col("dst") === col("open_src"), "left")
      .select(col("doc_id"),
        when(col("open_src").isNotNull, lit(null).cast("long"))
          .otherwise(coalesce(col("dst"), col("doc_id"))).as("final_doc"),
        when(col("open_src").isNotNull, lit(null).cast("long"))
          .otherwise(coalesce(col("hops"), lit(0L))).as("n_hops"),
        when(col("open_src").isNotNull, lit("loop"))
          .otherwise(lit("ok")).as("verdict"))
  }

  val redirectResolveOracle: String =
    """WITH d AS (
      |  SELECT doc_id, doc_id // 8 AS c, doc_id % 8 AS p,
      |         (doc_id // 8) % 8 + 1 AS len,
      |         (doc_id // 8) % 11 = 0 AS is_loop_block
      |  FROM documents)
      |SELECT doc_id,
      |       CASE WHEN is_loop_block AND p IN (1, 2) THEN NULL
      |            WHEN NOT is_loop_block AND p < len THEN 8 * c
      |            ELSE doc_id END AS final_doc,
      |       CASE WHEN is_loop_block AND p IN (1, 2) THEN NULL
      |            WHEN NOT is_loop_block AND p < len THEN p
      |            ELSE 0 END AS n_hops,
      |       CASE WHEN is_loop_block AND p IN (1, 2) THEN 'loop'
      |            ELSE 'ok' END AS verdict
      |FROM d
      |""".stripMargin

  // ------------------------------------------------- sitemap frontier

  /** Sitemap-driven crawl frontier — the discovery step between
    * robots policy and fetching: parse each domain's sitemap.xml,
    * compare against what's already crawled (canonical forms), and
    * emit only the NEW URLs with their declared lastmod/priority
    * hints. The fixture builds real sitemap XML per domain — every
    * already-crawled page plus 2–4 formula-known new entries — so the
    * parse → canonicalize → anti-join pipeline is exercised end to
    * end and the oracle predicts exactly the new tail.
    *
    * Scale shape: sitemaps are domain-grain (sites, not pages); the
    * anti-join is canonical-URL equi-join, corpus-linear; per-domain
    * crawled counts ride the same small domain aggregate. Zero UDFs —
    * XML assembly and parsing are regexp/HOF column expressions. */
  def sitemapFrontierQuery(spark: SparkSession, dir: String): DataFrame = {
    val crawled = messyUrl(spark, dir)
      .withColumn("canonical_url", canonicalizeUrl(col("url")))
      .select(col("canonical_url")).distinct()
      .withColumn("domain", regexp_extract(col("canonical_url"),
        "^[a-z][a-z0-9+.-]*://([^/:?#]*)", 1))
    val dNum = regexp_extract(col("domain"), "example([0-9]+)", 1)
      .cast("long")
    val sitemaps = crawled.groupBy(col("domain"))
      .agg(concat_ws("", sort_array(collect_list(
        concat(lit("<url><loc>"), col("canonical_url"), lit("</loc></url>"))
      ))).as("known_xml"),
        count(lit(1)).as("n_known"))
      .withColumn("new_xml", array_join(transform(
        sequence(lit(0L), lit(1L) + dNum % 3), k =>
          concat(lit("<url><loc>http://"), col("domain"),
            when(k % 2 === 0, lit("/public/new_")).otherwise(lit("/p/new_")),
            dNum.cast("string"), lit("_"), k.cast("string"),
            lit("</loc><lastmod>2025-01-"),
            lpad((lit(1L) + dNum * 3 + k).cast("string"), 2, "0"),
            lit("</lastmod><priority>0."),
            (lit(5L) + k).cast("string"),
            lit("</priority></url>"))), ""))
      .withColumn("sitemap", concat(
        lit("<?xml version=\"1.0\"?><urlset>"), col("known_xml"),
        col("new_xml"), lit("</urlset>")))
      .select(col("domain"), col("n_known"), col("sitemap"))
    val entries = sitemaps
      .select(col("domain"), col("n_known"),
        explode(regexp_extract_all(col("sitemap"),
          lit("<url>(.*?)</url>"), lit(1))).as("entry"))
      .select(col("domain"), col("n_known"),
        regexp_extract(col("entry"), "<loc>(.*?)</loc>", 1).as("url"),
        regexp_extract(col("entry"), "<lastmod>(.*?)</lastmod>", 1)
          .as("lastmod"),
        regexp_extract(col("entry"), "<priority>(.*?)</priority>", 1)
          .as("priority"))
    entries
      .join(crawled.select(col("canonical_url")),
        canonicalizeUrl(col("url")) === col("canonical_url"), "left_anti")
      .select(col("domain"), col("url"), col("lastmod"), col("priority"),
        col("n_known").cast("long").as("n_known"))
  }

  val sitemapFrontierOracle: String =
    """WITH g AS (
      |  SELECT DISTINCT doc_id // 3 AS grp FROM documents),
      |d AS (
      |  SELECT grp % 7 AS d, CAST(count(*) AS BIGINT) AS n_known
      |  FROM g GROUP BY 1),
      |k AS (
      |  SELECT d, n_known, k
      |  FROM d, unnest(generate_series(0, 1 + CAST(d % 3 AS BIGINT))) u(k))
      |SELECT 'www.example' || CAST(d AS VARCHAR) || '.com' AS domain,
      |       'http://www.example' || CAST(d AS VARCHAR) || '.com'
      |         || CASE WHEN k % 2 = 0 THEN '/public/new_' ELSE '/p/new_' END
      |         || CAST(d AS VARCHAR) || '_' || CAST(k AS VARCHAR) AS url,
      |       '2025-01-' || lpad(CAST(1 + d * 3 + k AS VARCHAR), 2, '0')
      |         AS lastmod,
      |       '0.' || CAST(5 + k AS VARCHAR) AS priority,
      |       n_known
      |FROM k
      |""".stripMargin

  /** Crawl PLAN — the composition a polite crawler actually runs:
    * sitemap discovery ([[sitemapFrontierQuery]]) produces the new
    * URLs, then the domain's robots policy (same longest-match RFC
    * 9309 semantics as [[robotsFilterQuery]], broadcast rules) decides
    * which of them may be fetched. Emits every frontier URL with its
    * verdict so the denied share is auditable, not silently dropped.
    * The fixture's frontier alternates `/public/` (Allow wins the
    * length tie against `Disallow: /p`) and `/p/` (denied) paths, so
    * both verdicts are exercised on every domain. */
  def crawlPlanQuery(spark: SparkSession, dir: String): DataFrame = {
    val frontier = sitemapFrontierQuery(spark, dir)
      .select(col("domain"), col("url"), col("priority"),
        regexp_extract(col("url"), "^[a-z][a-z0-9+.-]*://[^/]*(/.*)$", 1)
          .as("path"))
    val rules = robotsRules(spark)
      .withColumnRenamed("domain", "r_domain")
    frontier.join(broadcast(rules),
        frontier("domain") === col("r_domain") &&
          col("path").startsWith(col("rule_path")), "left")
      .select(col("domain"), col("url"), col("priority"),
        when(col("verb").isNull, lit(null)).otherwise(struct(
          length(col("rule_path")).as("l"),
          when(col("verb") === "Allow", 1).otherwise(0).as("a")))
          .as("m"))
      .groupBy(col("domain"), col("url"), col("priority"))
      .agg(max(col("m")).as("best"))
      .select(col("domain"), col("url"), col("priority"),
        (col("best").isNull || col("best.a") === 1).as("allowed"))
  }

  val crawlPlanOracle: String =
    """WITH d AS (
      |  SELECT DISTINCT (doc_id // 3) % 7 AS d FROM documents),
      |k AS (
      |  SELECT d, k
      |  FROM d, unnest(generate_series(0, 1 + CAST(d % 3 AS BIGINT))) u(k))
      |SELECT 'www.example' || CAST(d AS VARCHAR) || '.com' AS domain,
      |       'http://www.example' || CAST(d AS VARCHAR) || '.com'
      |         || CASE WHEN k % 2 = 0 THEN '/public/new_' ELSE '/p/new_' END
      |         || CAST(d AS VARCHAR) || '_' || CAST(k AS VARCHAR) AS url,
      |       '0.' || CAST(5 + k AS VARCHAR) AS priority,
      |       k % 2 = 0 AS allowed
      |FROM k
      |""".stripMargin

  // -------------------------------------------- registrable domains

  /** Registrable domain (eTLD+1) of a host column under the FULL
    * public-suffix-list algorithm — normal rules (longest match),
    * wildcard `*.base` rules, exception `!rule` rules that prevail
    * over everything, and the implicit `*` default for unlisted TLDs.
    * This is the grouping key domain caps and per-site politeness must
    * actually use: bare hosts let a site dodge its cap via subdomains,
    * a last-two-labels fold merges every .co.uk site into one, and a
    * two-level-only subset miscaps wildcard families like
    * `*.kawasaki.jp`. A host that IS a public suffix has no
    * registrable domain (null).
    *
    * The rule tables come from the vendored
    * [[graft.functions.PslData]] snapshot, compiled into per-length
    * membership literals — pure codegen'd array ops, no UDF, no join;
    * the complete publicsuffix.org file drops into PslData verbatim.
    *
    * `includePrivate` (round 13, default OFF) also applies the PSL's
    * PRIVATE section ([[graft.functions.PslPrivateData]] — github.io,
    * blogspot.*, S3 buckets, ...): a deployment policy switch between
    * site-level grouping (on — each github.io user is its own
    * "registrable" site) and registrant-level grouping (off — all of
    * github.io folds into github.io's registrant). Same compiled-InSet
    * probe shape either way. */
  def registrableDomain(host: Column,
                        includePrivate: Boolean = false): Column = {
    import graft.functions.PslData
    val labels = split(lower(host), "\\.")
    val n = size(labels)
    // try_element_at: ANSI-safe on hosts with fewer labels than the rule
    // being probed — every probe is additionally guarded by n >= k, so
    // the null-skipped shorter string can never false-match a k-label
    // rule (it has fewer dots than any rule of that length)
    def lastK(k: Int): Column =
      concat_ws(".", (k to 1 by -1).map(i => try_element_at(labels, lit(-i))): _*)
    // isin compiles to InSet (hash lookup) above the conversion
    // threshold — the probe stays O(1) as the vendored rule snapshot
    // grows, where array_contains would scan the literal array per row
    def inSet(c: Column, set: Seq[String]): Column =
      if (set.isEmpty) lit(false) else c.isin(set: _*)
    // exception rules prevail: registrable = the rule itself
    val excArm = (PslData.maxExcLen(includePrivate) to 1 by -1)
      .foldLeft(Option.empty[(Column, Column)]) {
      case (acc, e) =>
        val cond = n >= e &&
          inSet(lastK(e), PslData.exceptionsByLen(e, includePrivate))
        acc match {
          case None => Some((cond, lastK(e)))
          case Some((c0, v0)) => Some((c0 || cond, when(c0, v0).otherwise(lastK(e))))
        }
    }
    // non-exception: longest public suffix p wins; wildcard base b
    // yields p = b+1; registrable = last p+1 labels, null if host == ps
    var result: Column = when(n > 1, lastK(2)).otherwise(lit(null)) // implicit *
    for (p <- 1 to PslData.maxPsLen(includePrivate)) {
      val wildcardHit =
        if (p >= 2) n >= p &&
          inSet(lastK(p - 1), PslData.wildcardBasesByLen(p - 1, includePrivate))
        else lit(false)
      val isPs = (n >= p &&
        inSet(lastK(p), PslData.normalByLen(p, includePrivate))) || wildcardHit
      result = when(isPs, when(n > p, lastK(p + 1)).otherwise(lit(null)))
        .otherwise(result)
    }
    excArm match {
      case Some((c, v)) => when(c, v).otherwise(result)
      case None => result
    }
  }

  /** Per-document registrable-domain extraction over a host mix that
    * crosses every PSL rule kind: deep subdomains under two- and
    * three-label normal rules (.co.uk, gov.uk, k12.ca.us), a wildcard
    * family (`*.kawasaki.jp` — one arm a plain label under it, one arm
    * a subdomain of that), the wildcard's EXCEPTION
    * (`!city.kawasaki.jp`), the `*.ck` / `!www.ck` pair, an unlisted
    * TLD hitting the implicit `*` rule, plain .com/.org, and — from the
    * round-11 snapshot expansion — a multi-level ccSLD absent from the
    * old subset (asso.fr), a jp PREFECTURE rule (tokyo.jp), com.pl,
    * and a 3-label Tokyo-ward rule that must out-rank its 2-label
    * prefecture parent (chiyoda.tokyo.jp). */
  def registrableDomainQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val d = (col("doc_id") % 7).cast("string")
    val host = when(col("doc_id") % 12 === 0,
        concat(lit("a"), (col("doc_id") % 11).cast("string"),
          lit(".example"), d, lit(".co.uk")))
      .when(col("doc_id") % 12 === 1, concat(lit("www.example"), d, lit(".com")))
      .when(col("doc_id") % 12 === 2,
        concat(lit("b.c.example"), d, lit(".com.au")))
      .when(col("doc_id") % 12 === 3,
        concat(lit("x.dept"), d, lit(".gov.uk")))
      .when(col("doc_id") % 12 === 4,
        concat(lit("shop.town"), d, lit(".kawasaki.jp")))
      .when(col("doc_id") % 12 === 5,
        concat(lit("a.city.kawasaki.jp")))
      .when(col("doc_id") % 12 === 6,
        concat(lit("deep.site"), d, lit(".ck")))
      .when(col("doc_id") % 12 === 8,
        concat(lit("blog.club"), d, lit(".asso.fr")))
      .when(col("doc_id") % 12 === 9,
        concat(lit("web.office"), d, lit(".tokyo.jp")))
      .when(col("doc_id") % 12 === 10,
        concat(lit("x.shop"), d, lit(".com.pl")))
      .when(col("doc_id") % 12 === 11,
        concat(lit("portal.ward"), d, lit(".chiyoda.tokyo.jp")))
      .otherwise(concat(lit("example"), d, lit(".zz")))
    docs.withColumn("host", host)
      .withColumn("registrable", registrableDomain(col("host")))
  }

  val registrableDomainOracle: String =
    """SELECT doc_id,
      |       CASE doc_id % 12
      |         WHEN 0 THEN 'a' || CAST(doc_id % 11 AS VARCHAR) || '.example'
      |                    || CAST(doc_id % 7 AS VARCHAR) || '.co.uk'
      |         WHEN 1 THEN 'www.example' || CAST(doc_id % 7 AS VARCHAR) || '.com'
      |         WHEN 2 THEN 'b.c.example' || CAST(doc_id % 7 AS VARCHAR) || '.com.au'
      |         WHEN 3 THEN 'x.dept' || CAST(doc_id % 7 AS VARCHAR) || '.gov.uk'
      |         WHEN 4 THEN 'shop.town' || CAST(doc_id % 7 AS VARCHAR) || '.kawasaki.jp'
      |         WHEN 5 THEN 'a.city.kawasaki.jp'
      |         WHEN 6 THEN 'deep.site' || CAST(doc_id % 7 AS VARCHAR) || '.ck'
      |         WHEN 8 THEN 'blog.club' || CAST(doc_id % 7 AS VARCHAR) || '.asso.fr'
      |         WHEN 9 THEN 'web.office' || CAST(doc_id % 7 AS VARCHAR) || '.tokyo.jp'
      |         WHEN 10 THEN 'x.shop' || CAST(doc_id % 7 AS VARCHAR) || '.com.pl'
      |         WHEN 11 THEN 'portal.ward' || CAST(doc_id % 7 AS VARCHAR)
      |                     || '.chiyoda.tokyo.jp'
      |         ELSE 'example' || CAST(doc_id % 7 AS VARCHAR) || '.zz' END AS host,
      |       CASE doc_id % 12
      |         WHEN 0 THEN 'example' || CAST(doc_id % 7 AS VARCHAR) || '.co.uk'
      |         WHEN 1 THEN 'example' || CAST(doc_id % 7 AS VARCHAR) || '.com'
      |         WHEN 2 THEN 'example' || CAST(doc_id % 7 AS VARCHAR) || '.com.au'
      |         WHEN 3 THEN 'dept' || CAST(doc_id % 7 AS VARCHAR) || '.gov.uk'
      |         WHEN 4 THEN 'shop.town' || CAST(doc_id % 7 AS VARCHAR) || '.kawasaki.jp'
      |         WHEN 5 THEN 'city.kawasaki.jp'
      |         WHEN 6 THEN 'deep.site' || CAST(doc_id % 7 AS VARCHAR) || '.ck'
      |         WHEN 8 THEN 'club' || CAST(doc_id % 7 AS VARCHAR) || '.asso.fr'
      |         WHEN 9 THEN 'office' || CAST(doc_id % 7 AS VARCHAR) || '.tokyo.jp'
      |         WHEN 10 THEN 'shop' || CAST(doc_id % 7 AS VARCHAR) || '.com.pl'
      |         WHEN 11 THEN 'ward' || CAST(doc_id % 7 AS VARCHAR)
      |                     || '.chiyoda.tokyo.jp'
      |         ELSE 'example' || CAST(doc_id % 7 AS VARCHAR) || '.zz' END
      |         AS registrable
      |FROM documents
      |""".stripMargin

  /** Fetch-time budget — the politeness arithmetic after the plan:
    * each domain's robots `Crawl-delay` caps the request rate, so
    * the time to drain its allowed frontier is `n_fetch × delay`.
    * This is the number a crawl scheduler shards domains by (one slow
    * domain with a 3-second delay dominates wall-clock long before
    * byte volume does). Composes [[crawlPlanQuery]]'s allowed set
    * with the delay parsed from the robots text — domain-grain
    * everywhere, broadcast-sized. */
  def fetchBudgetQuery(spark: SparkSession, dir: String): DataFrame = {
    val delays = robotsTxt(spark)
      .select(col("domain"),
        regexp_extract(col("robots"), "(?m)^Crawl-delay: (\\d+)$", 1)
          .cast("long").as("crawl_delay_s"))
    crawlPlanQuery(spark, dir)
      .filter(col("allowed"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_fetch"))
      .join(delays, "domain")
      .select(col("domain"), col("crawl_delay_s"), col("n_fetch"),
        (col("n_fetch") * col("crawl_delay_s")).as("est_seconds"))
  }

  val fetchBudgetOracle: String =
    """WITH d AS (
      |  SELECT DISTINCT (doc_id // 3) % 7 AS d FROM documents)
      |SELECT 'www.example' || CAST(d AS VARCHAR) || '.com' AS domain,
      |       CAST(1 + d % 3 AS BIGINT) AS crawl_delay_s,
      |       CAST(CASE d % 3 WHEN 0 THEN 1 ELSE 2 END AS BIGINT) AS n_fetch,
      |       CAST((1 + d % 3) * CASE d % 3 WHEN 0 THEN 1 ELSE 2 END
      |            AS BIGINT) AS est_seconds
      |FROM d
      |""".stripMargin
}
