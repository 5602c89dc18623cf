package graft

import graft.connect.ParquetWarehouse
import graft.core.RunDate
import graft.pipelines.Population
import graft.reconcile.{Reconcile, Report}

class ReportPopulationSpec extends SparkSpec {
  import spark.implicits._

  test("reconciliation report renders counts, worst columns, and escaped samples") {
    val src = Seq((1, "a<b"), (2, "y")).toDF("id", "v")
    val tgt = Seq((1, "a>b"), (2, "y")).toDF("id", "v")
    val html = Report.reconciliation(Reconcile.diff(src, tgt, Seq("id")))
    assert(html.contains("<h3>Row counts</h3>"))
    assert(html.contains("source_rows"))
    assert(html.contains("a&lt;b") && html.contains("a&gt;b")) // escaped
    assert(!html.contains("a<b"))
  }

  test("htmlTable bounds rows via limit") {
    val html = Report.htmlTable(spark.range(1000).toDF("n"), n = 3)
    assert(html.linesIterator.count(_.startsWith("<tr>")) == 4) // header + 3
  }

  test("report delivery round-trips through the pluggable sink seam") {
    // the reference's end state is an EMAILED report (Raptor.py:656-682);
    // the engine's transport seam is (subject, html) => Unit with a
    // file-based default — render a real diff through it and read the
    // delivered document back
    val src = Seq((1, "a<b"), (2, "y")).toDF("id", "v")
    val tgt = Seq((1, "a>b"), (2, "y")).toDF("id", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft_report_sink").toString
    val sink = new graft.reconcile.FileReportSink(dir)
    Report.deliver(Reconcile.diff(src, tgt, Seq("id")),
      "Raptor Recon: sales vs sales_replica (2024-06-01)", sink)
    val path = java.nio.file.Path.of(dir,
      "raptor_recon_sales_vs_sales_replica_2024_06_01.html")
    assert(java.nio.file.Files.exists(path), "slugged delivery file")
    val doc = java.nio.file.Files.readString(path)
    assert(doc.contains("<title>Raptor Recon: sales vs sales_replica (2024-06-01)</title>"))
    assert(doc.contains("<h3>Row counts</h3>") && doc.contains("a&lt;b"))
    assert(!doc.contains("a<b"), "cell content stays escaped through the seam")
    // same-subject redelivery overwrites (one current report per subject)
    Report.deliver(Reconcile.diff(src, src, Seq("id")),
      "Raptor Recon: sales vs sales_replica (2024-06-01)", sink)
    assert(java.nio.file.Files.list(java.nio.file.Path.of(dir)).count() == 1)
    // a custom transport plugs in through the same seam
    var delivered: (String, String) = null
    Report.deliver(Reconcile.diff(src, tgt, Seq("id")), "subj",
      (s: String, h: String) => delivered = (s, h))
    assert(delivered._1 == "subj" && delivered._2.contains("<h3>Row counts</h3>"))
  }

  test("smtp sink delivers subject/recipients/body to a real socket server") {
    // minimal in-test RFC 5321 server on an ephemeral port: records the
    // envelope and DATA payload, answers the canonical reply codes
    val server = new java.net.ServerSocket(0)
    @volatile var envelope = List.empty[String]
    @volatile var data = ""
    val t = new Thread(() => {
      val s = server.accept()
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(s.getInputStream, "US-ASCII"))
      val out = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(s.getOutputStream, "US-ASCII"))
      def reply(r: String): Unit = { out.write(r + "\r\n"); out.flush() }
      reply("220 graft-test ESMTP")
      var line = in.readLine()
      var inData = false
      val buf = new StringBuilder
      while (line != null) {
        if (inData) {
          if (line == ".") {
            data = buf.toString; inData = false; reply("250 OK")
          } else buf.append(line).append("\r\n")
        } else {
          val u = line.toUpperCase
          if (u.startsWith("EHLO")) { reply("250-graft-test"); reply("250 OK") }
          else if (u.startsWith("MAIL FROM") || u.startsWith("RCPT TO")) {
            envelope = envelope :+ line; reply("250 OK")
          } else if (u.startsWith("DATA")) { inData = true; reply("354 go") }
          else if (u.startsWith("QUIT")) { reply("221 bye"); line = null }
        }
        if (line != null) line = in.readLine()
      }
      s.close()
    })
    t.start()
    try {
      val html = "<table><tr><td>42 &amp; rising</td></tr></table>"
      val sink = new graft.reconcile.SmtpReportSink("127.0.0.1",
        server.getLocalPort, "etl@example.com",
        Seq("ops@example.com", "data@example.com"))
      sink.deliver("Reconciliation Report", html)
      t.join(15000)
      assert(envelope == List("MAIL FROM:<etl@example.com>",
        "RCPT TO:<ops@example.com>", "RCPT TO:<data@example.com>"))
      assert(data.contains("Subject: Reconciliation Report"))
      assert(data.contains("To: <ops@example.com>, <data@example.com>"))
      assert(data.contains("Content-Type: text/html; charset=utf-8"))
      // body survives the wire bit-for-bit through the base64 part
      val b64 = data.split("\r\n\r\n", 2)(1).replace("\r\n", "")
      val decoded = new String(java.util.Base64.getDecoder.decode(b64), "UTF-8")
      assert(decoded == html)
    } finally server.close()
  }

  test("smtp sink encodes non-ascii subjects as rfc 2047 words") {
    val sink = new graft.reconcile.SmtpReportSink("127.0.0.1", 25,
      "a@example.com", Seq("b@example.com"))
    val msg = sink.mimeMessage("Résumé ✓", "<p>x</p>")
    val enc = msg.linesIterator.find(_.startsWith("Subject: ")).get
      .stripPrefix("Subject: ")
    assert(enc.startsWith("=?utf-8?B?") && enc.endsWith("?="))
    val decoded = new String(java.util.Base64.getDecoder.decode(
      enc.stripPrefix("=?utf-8?B?").stripSuffix("?=")), "UTF-8")
    assert(decoded == "Résumé ✓")
    // ascii subjects stay readable
    assert(sink.mimeMessage("Plain Report", "x")
      .contains("Subject: Plain Report"))
  }

  test("population pipeline: REST fake -> backtick-safe rename -> guarded write") {
    val body =
      """{"data":[
        |  {"ID Nation":"01000US","Nation":"United States","ID Year":2020,
        |   "Year":"2020","Population":326569308,"Slug Nation":"united-states"},
        |  {"ID Nation":"01000US","Nation":"United States","ID Year":2021,
        |   "Year":"2021","Population":329725481,"Slug Nation":"united-states"}
        |]}""".stripMargin
    val wh = new ParquetWarehouse(
      java.nio.file.Files.createTempDirectory("graft_pop").toString)
    val n = Population.run(spark, "http://fake/population", _ => body,
      RunDate("2024-06-01"), wh)
    assert(n == 2)
    val out = wh.readStaging(spark, "population")
    assert(out.columns.toSeq ==
      Seq("id_nation", "nation", "id_year", "year", "population",
          "slug_nation", "day_dt"))
    assert(out.select("population").as[Long].collect().sorted.toSeq ==
      Seq(326569308L, 329725481L))
  }

  test("approxCardinality is within rsd of the exact distinct count") {
    val li = graft.core.Tables.lineitem(spark, sf)
    val exact = li.select("l_partkey").distinct().count()
    val approx = graft.ops.Exp.approxCardinality(li, "l_partkey", rsd = 0.05)
    assert(math.abs(approx - exact).toDouble / exact < 0.15)
  }

  test("approxTiers returns sketch quantiles within tolerance") {
    val df = spark.range(1, 1001).selectExpr("CAST(id AS DOUBLE) AS x")
    val Array(p50, p80) = graft.ops.Exp.approxTiers(df, "x")
    assert(math.abs(p50 - 500) <= 1000 * 0.01 + 1)
    assert(math.abs(p80 - 800) <= 1000 * 0.01 + 1)
  }
}
