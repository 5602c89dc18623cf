package graft

import org.apache.spark.sql.functions._
import graft.ops.UrlOps

/** URL canonicalization laws: the rule table case by case, idempotence,
  * and the things canonicalization must NOT touch (non-default ports,
  * https-vs-http, real params that merely look like trackers). */
class UrlOpsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(UrlOps.canonicalizeUrl(col("u"))).as[String]
      .collect().toSeq
  }

  test("canonicalization rule table") {
    val cases = Seq(
      // lowercase scheme + host, default port, fragment, trailing slash
      "HTTP://WWW.Example.COM:80/A/B/?b=2&a=1#frag" ->
        "http://www.example.com/A/B?a=1&b=2",
      // https default port
      "HTTPS://Site.Org:443/x" -> "https://site.org/x",
      // non-default port SURVIVES
      "http://site.org:8080/x" -> "http://site.org:8080/x",
      // https on 80 is not a default port
      "https://site.org:80/x" -> "https://site.org:80/x",
      // tracking params dropped, rest sorted; param order normalized
      "http://a.com/p?utm_source=t&z=9&utm_medium=m&a=1&gclid=g&fbclid=f" ->
        "http://a.com/p?a=1&z=9",
      // params that merely CONTAIN utm aren't trackers
      "http://a.com/p?myutm_source=keep&autm=2" ->
        "http://a.com/p?autm=2&myutm_source=keep",
      // all params tracked -> no query at all
      "http://a.com/p?utm_source=x" -> "http://a.com/p",
      // empty path -> /
      "http://a.com" -> "http://a.com/",
      "http://a.com/#top" -> "http://a.com/",
      // path case preserved (paths are case-sensitive)
      "http://a.com/CaseMatters" -> "http://a.com/CaseMatters",
      // multiple trailing slashes collapse
      "http://a.com/p///" -> "http://a.com/p",
      // duplicate param keys both survive, sorted stably as strings
      "http://a.com/p?a=2&a=1" -> "http://a.com/p?a=1&a=2")
    val got = canon(cases.map(_._1): _*)
    cases.zip(got).foreach { case ((in, want), actual) =>
      assert(actual == want, s"canon($in)")
    }
  }

  test("canonicalization is idempotent") {
    val messy = Seq(
      "HTTP://WWW.Example.COM:80/A/B/?b=2&a=1#frag",
      "https://Site.Org:443/x?utm_source=1",
      "http://a.com", "http://a.com/p?z=1&y=2&x=3")
    val once = canon(messy: _*)
    val twice = canon(once: _*)
    assert(once == twice)
  }

  test("url dedup collapses every messy triple to one survivor") {
    import spark.implicits._
    val rows = UrlOps.urlDedupQuery(spark, sf)
      .as[(String, Long, Long)].collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_._2).sum == nDocs)        // every doc accounted for
    assert(rows.forall { case (u, _, survivor) =>
      !u.contains("utm") && !u.contains("#") && !u.contains(":80") &&
        u.startsWith("http://www.example") && survivor % 3 == 0 })
    assert(rows.count(_._2 == 3L) >= rows.length - 1) // last group may be short
  }

  test("domain cap reports totals and capped keeps per domain") {
    import spark.implicits._
    val rows = UrlOps.urlDomainCapQuery(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.length == 7)
    assert(rows.forall { case (d, total, kept) =>
      d.matches("www\\.example[0-6]\\.com") && kept == math.min(total, 50L) })
  }

  test("robots filter: longest match wins, Allow beats Disallow on ties") {
    import spark.implicits._
    val rows = UrlOps.robotsFilterQuery(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.length == 7)
    // /public/ (Allow beats the shorter Disallow /p) and /img/ always
    // pass; /private/ never does; /tmp/ passes only on odd domains
    rows.foreach { case (d, allowed, denied) =>
      val dn = d.stripPrefix("www.example").stripSuffix(".com").toInt
      assert(allowed > 0 && denied > 0)
      val total = allowed + denied
      val tmpAllowed = dn % 2 == 1
      // sections are uniform quarters up to rounding
      assert(allowed >= (if (tmpAllowed) 3 else 2) * (total / 4) - 3,
        s"$d allowed=$allowed denied=$denied")
    }
  }

  test("redirect resolution: chains land on heads in 3 rounds, loops flagged") {
    import spark.implicits._
    val rows = UrlOps.redirectResolveQuery(spark, sf)
      .as[(Long, Option[Long], Option[Long], String)].collect()
    val byId = rows.map(r => r._1 -> r).toMap
    rows.foreach { case (id, fin, hops, verdict) =>
      val c = id / 8; val p = id % 8; val len = (c % 8) + 1
      if (c % 11 == 0 && (p == 1 || p == 2)) {
        assert(verdict == "loop" && fin.isEmpty && hops.isEmpty, s"doc $id")
      } else if (c % 11 != 0 && p < len) {
        assert(verdict == "ok" && fin.contains(8 * c) && hops.contains(p),
          s"doc $id")
      } else {
        assert(verdict == "ok" && fin.contains(id) && hops.contains(0L),
          s"doc $id")
      }
    }
    assert(rows.count(_._4 == "loop") > 0)
    assert(byId.size == rows.length)
  }

  test("registrableDomain: private section activates ONLY via the flag") {
    import spark.implicits._
    def reg(includePrivate: Boolean, hosts: String*): Seq[Option[String]] =
      hosts.toDF("h")
        .select(UrlOps.registrableDomain(col("h"), includePrivate))
        .as[Option[String]].collect().toSeq
    val hosts = Seq("user.github.io", "page.user.github.io",
      "me.blogspot.com", "bucket.s3.amazonaws.com", "github.io",
      "www.example.com")
    // default / off: registrant-level grouping — private boundaries
    // are ordinary subdomains
    assert(reg(includePrivate = false, hosts: _*) == Seq(
      Some("github.io"), Some("github.io"), Some("blogspot.com"),
      Some("amazonaws.com"), Some("github.io"), Some("example.com")))
    // on: site-level grouping — each private-suffix tenant is its own
    // registrable site, and a bare private suffix has none
    assert(reg(includePrivate = true, hosts: _*) == Seq(
      Some("user.github.io"), Some("user.github.io"),
      Some("me.blogspot.com"), Some("bucket.s3.amazonaws.com"), None,
      Some("example.com")))
  }

  test("registrableDomain: full PSL rule-kind table") {
    import spark.implicits._
    def reg(hosts: String*): Seq[Option[String]] =
      hosts.toDF("h").select(UrlOps.registrableDomain(col("h")))
        .as[Option[String]].collect().toSeq
    val cases = Seq(
      // normal rules, longest match
      "a.b.example.co.uk" -> Some("example.co.uk"),
      "x.dept.gov.uk" -> Some("dept.gov.uk"),
      "deep.school.k12.ca.us" -> Some("school.k12.ca.us"),
      "www.example.com" -> Some("example.com"),
      // wildcard *.kawasaki.jp: one label under the base is the suffix
      "shop.town.kawasaki.jp" -> Some("shop.town.kawasaki.jp"),
      "a.shop.town.kawasaki.jp" -> Some("shop.town.kawasaki.jp"),
      // its exception !city.kawasaki.jp prevails over the wildcard
      "city.kawasaki.jp" -> Some("city.kawasaki.jp"),
      "a.city.kawasaki.jp" -> Some("city.kawasaki.jp"),
      // *.ck with !www.ck
      "a.b.ck" -> Some("a.b.ck"),
      "sub.www.ck" -> Some("www.ck"),
      "www.ck" -> Some("www.ck"),
      // unlisted TLD -> implicit * rule
      "example.zz" -> Some("example.zz"),
      "a.example.zz" -> Some("example.zz"),
      // a host that IS a public suffix has no registrable domain
      "co.uk" -> None,
      "gov.uk" -> None,
      "com" -> None,
      // the wildcard needs a label to match: bare kawasaki.jp only hits
      // the implicit jp rule, so it IS a registrable domain
      "kawasaki.jp" -> Some("kawasaki.jp"),
      // case folding
      "WWW.Example.CO.UK" -> Some("example.co.uk"),
      // round-11 snapshot expansion: multi-level ccSLDs absent from
      // the old subset
      "blog.assoc.asso.fr" -> Some("assoc.asso.fr"),
      "x.shop.com.pl" -> Some("shop.com.pl"),
      "asso.fr" -> None,
      // jp prefecture normal rule
      "web.office.tokyo.jp" -> Some("office.tokyo.jp"),
      "tokyo.jp" -> None,
      // 3-label Tokyo-ward rule out-ranks its 2-label prefecture parent
      "portal.ward.chiyoda.tokyo.jp" -> Some("ward.chiyoda.tokyo.jp"),
      "chiyoda.tokyo.jp" -> None,
      // new wildcard TLDs
      "a.b.kh" -> Some("a.b.kh"),
      "x.gov.fk" -> Some("x.gov.fk"),
      // US state grid
      "deep.lib.wy.us" -> Some("deep.lib.wy.us"),
      "a.deep.cc.tx.us" -> Some("deep.cc.tx.us"),
      // round-12 full-ICANN vendoring: per-state carve-outs the old
      // k12/cc/lib grid missed
      "school.pvt.k12.ma.us" -> Some("school.pvt.k12.ma.us"),
      "x.school.chtr.k12.ma.us" -> Some("school.chtr.k12.ma.us"),
      // jp geo city rules beyond the old Tokyo-ward subset
      "farm.aisai.aichi.jp" -> Some("farm.aisai.aichi.jp"),
      "a.farm.aisai.aichi.jp" -> Some("farm.aisai.aichi.jp"),
      // ccSLD families absent from the old ~480-rule snapshot
      "x.co.bw" -> Some("x.co.bw"),
      "shop.co.zw" -> Some("shop.co.zw"),
      // punycode twin of an IDN rule (公司.cn → xn--55qx5d.cn)
      "shop.xn--55qx5d.cn" -> Some("shop.xn--55qx5d.cn"),
      "a.shop.xn--55qx5d.cn" -> Some("shop.xn--55qx5d.cn"))
    val got = reg(cases.map(_._1): _*)
    cases.zip(got).foreach { case ((h, want), g) =>
      assert(g == want, s"$h: got $g want $want")
    }
  }
}
