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
