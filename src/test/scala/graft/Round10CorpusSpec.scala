package graft

import org.apache.spark.sql.functions._
import graft.ops.{TextAnalysis, UrlOps}

/** Real-markup smoke corpus: a few hundred pages ASSEMBLED from messy
  * real-world HTML idioms (WordPress/Bootstrap-style wrappers, comments
  * containing markup, script blocks, uppercase tags, single-quoted and
  * whitespace-laden attributes, entities, tracking params, mailto /
  * javascript / anchor / protocol-relative links) with per-page planted
  * ground truth — the breakage class formula fixtures can't hit. This
  * container has no egress, so the pages are authored here rather than
  * fetched; every idiom is modeled on markup that is ubiquitous in real
  * crawls. */
class Round10CorpusSpec extends SparkSpec {

  /** One generated page + its ground truth. */
  private case class Page(id: Long, html: String, links: Seq[String],
                          tableCells: Seq[Seq[String]])

  private def mkPage(i: Int): Page = {
    val links = scala.collection.mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    sb.append("<!DOCTYPE html>\n<html lang=\"en\">\n<head>\n")
    sb.append(s"<title>Page $i — demo &amp; test</title>\n")
    sb.append("<!-- header comment with <table> and href=\"http://not-a-link.example/\" inside -->\n")
    // NOTE: regex extraction DOES see hrefs inside comments/scripts —
    // that is the documented semantics, so they go into ground truth
    links += "http://not-a-link.example/"
    sb.append("<meta charset='utf-8'>\n</head>\n<body class=\"wp-body page-template\">\n")
    // nav with a mix of link shapes
    val navHost = s"www.site${i % 23}.example.com"
    sb.append("<nav class=\"navbar navbar-expand-lg\">")
    val abs = s"HTTP://$navHost:80/Articles/${i % 50}?utm_source=nav&id=${i % 7}"
    sb.append(s"""<a class="nav-link" href="$abs">article</a>""")
    links += abs
    val single = s"https://cdn${i % 5}.example.net/lib.css"
    sb.append(s"<link rel='stylesheet' href='$single'>")
    links += single
    sb.append("""<a href="mailto:someone@example.org">mail</a>""")
    links += "mailto:someone@example.org"
    sb.append("""<a href="javascript:void(0)">noop</a>""")
    links += "javascript:void(0)"
    sb.append(s"""<a href="#section-${i % 4}">anchor</a>""")
    links += s"#section-${i % 4}"
    sb.append(s"""<a href="//static.example.org/img${i % 9}.png">img</a>""")
    links += s"//static.example.org/img${i % 9}.png"
    if (i % 3 == 0) {
      val spaced = s"https://spaced${i % 11}.example.io/path"
      sb.append(s"""<a href = "$spaced">spaced attr</a>""")
      links += spaced
    }
    sb.append("</nav>\n")
    // script block with an embedded href-looking string
    if (i % 4 == 1) {
      val js = s"http://tracker${i % 6}.example.ads/pixel?fbclid=x$i"
      sb.append(s"""<script>var u = "<a href='$js'>";</script>\n""")
      links += js
    }
    // a messy table every other page
    val cells: Seq[Seq[String]] =
      if (i % 2 == 0) {
        val rows = (0 until 2 + i % 3).map { r =>
          (0 until 2 + i % 2).map(c => s"v${i}_${r}_$c" +
            (if (c == 0) " &amp; co" else ""))
        }
        sb.append(s"""<TABLE class="wp-block-table" style="width:100%">""")
        rows.zipWithIndex.foreach { case (row, r) =>
          sb.append(if (r == 0) "<TR >" else "<tr>")
          row.zipWithIndex.foreach { case (cell, c) =>
            val tag = if (r == 0) "TH" else "td"
            val attrs = if (c == 0) " colspan=\"1\" data-col=\"a\"" else ""
            val body = if (c == 1) s"<span class='x'>$cell</span>" else cell
            sb.append(s"<$tag$attrs>$body</$tag>")
          }
          sb.append(if (r == 0) "</TR>" else "</tr>")
        }
        sb.append("</TABLE>\n")
        rows
      } else Nil
    sb.append(s"<p>footer text &copy; $i</p>\n</body>\n</html>\n")
    Page(i.toLong, sb.toString, links.toSeq, cells)
  }

  private lazy val corpus: Seq[Page] = (0 until 300).map(mkPage)

  test("outlinks recovers every planted link shape across 300 messy pages") {
    import spark.implicits._
    val df = corpus.map(p => (p.id, p.html)).toDF("id", "html")
    val got = TextAnalysis.outlinks(df, col("html"))
      .select($"id", $"href").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    corpus.foreach { p =>
      val want = p.links.toSet
      val have = got.getOrElse(p.id, Set.empty)
      assert(have == want,
        s"page ${p.id}: missing ${want -- have}, extra ${have -- want}")
    }
  }

  test("canonicalizeUrl + registrableDomain survive the messy absolute links") {
    import spark.implicits._
    val absLinks = corpus.flatMap(p => p.links.filter(l =>
      l.toLowerCase.startsWith("http"))).distinct
    val out = absLinks.toDF("u")
      .select(UrlOps.canonicalizeUrl(col("u")).as("c"))
      .withColumn("host", regexp_extract(col("c"),
        "^[a-z][a-z0-9+.-]*://([^/:?#]*)", 1))
      .withColumn("reg", UrlOps.registrableDomain(col("host")))
      .as[(String, String, String)].collect()
    out.foreach { case (c, host, reg) =>
      assert(c.startsWith("http://") || c.startsWith("https://"), c)
      assert(!c.contains("utm_source") && !c.contains("fbclid"),
        s"tracking param survived: $c")
      assert(host == host.toLowerCase, s"host not folded: $host")
      // all fixture hosts are *.example.{com,net,io,ads,org,example}-style:
      // the registrable domain must be a suffix of the host with <= 3 labels
      assert(host.endsWith(reg), s"$reg not a suffix of $host")
      assert(reg.count(_ == '.') <= 2, s"registrable too deep: $reg")
    }
  }

  test("htmlTables recovers planted cells through uppercase tags, attrs, spans") {
    import spark.implicits._
    val df = corpus.map(p => (p.id, p.html)).toDF("id", "html")
    val got = TextAnalysis.htmlTables(df, col("html"))
      .select($"id", $"table_idx", $"row_idx", $"row_text")
      .as[(Long, Int, Int, String)].collect()
      .groupBy(_._1)
    corpus.foreach { p =>
      val rows = got.getOrElse(p.id, Array.empty).sortBy(_._3)
      if (p.tableCells.isEmpty) {
        assert(rows.isEmpty, s"page ${p.id}: phantom table rows")
      } else {
        assert(rows.length == p.tableCells.length,
          s"page ${p.id}: ${rows.length} rows, want ${p.tableCells.length}")
        rows.zip(p.tableCells).foreach { case ((_, t, _, text), want) =>
          assert(t == 0)
          assert(text == want.mkString("|"), s"page ${p.id}: $text")
        }
      }
    }
  }

  test("the whole corpus drives end-to-end without a throw, outlink graph sane") {
    import spark.implicits._
    val df = corpus.map(p => (p.id, p.html)).toDF("id", "html")
    val edges = TextAnalysis.outlinks(df, col("html"))
      .filter(lower(col("href")).startsWith("http"))
      .select(UrlOps.canonicalizeUrl(col("href")).as("c"))
      .select(regexp_extract(col("c"),
        "^[a-z][a-z0-9+.-]*://([^/:?#]*)", 1).as("host"))
      .groupBy(UrlOps.registrableDomain(col("host")).as("domain"))
      .agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(edges.nonEmpty)
    assert(edges.values.sum >= 300, "every page contributed at least one edge")
  }
}
