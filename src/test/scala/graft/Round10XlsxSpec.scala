package graft

import graft.ops.Archives
import graft.ops.Archives.XlsxCell

/** XLSX cell-extraction laws: round-trip over kind mixes, shared-string
  * dedup, wide-column refs past Z, XML entity escaping, and the hostile
  * inputs (truncated zip, dangling sst index, missing sheet). */
class Round10XlsxSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("grid round-trips across kinds, shared strings deduplicated") {
    val grid: Seq[Seq[Either[String, Double]]] = Seq(
      Seq(Left("dup"), Left("b1"), Right(7.0)),
      Seq(Left("dup"), Right(2.5), Left("<tag> & amp")),
      Seq(Right(300.0), Left("dup"), Left("z")))
    val xlsx = Archives.writeXlsx(grid, k => k % 2 == 0)
    val cells = Archives.xlsxCells(xlsx).get
    assert(cells.size == 9)
    assert(cells.filter(_.value == "dup").size == 3)
    assert(cells.exists(c => c.row == 2 && c.col == 3 && c.value == "<tag> & amp"),
      "XML entities must unescape")
    assert(cells.exists(c => c.row == 3 && c.col == 1 && c.kind == "number" && c.value == "300"))
    assert(cells.exists(c => c.row == 2 && c.col == 2 && c.value == "2.5"))
    // shared-string table actually deduplicates: the sst member holds
    // one <si> per distinct shared string
    val zis = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(xlsx))
    var sst = ""
    var e = zis.getNextEntry
    while (e != null) {
      if (e.getName == "xl/sharedStrings.xml") {
        val buf = new Array[Byte](65536)
        val n = zis.read(buf)
        sst = new String(buf, 0, math.max(n, 0), "UTF-8")
      }
      e = zis.getNextEntry
    }
    val nSi = "<si>".r.findAllIn(sst).size
    assert(nSi == sst.split("</si>").length - 1)
    assert(nSi < 9, s"sst not deduplicated: $nSi entries")
  }

  test("column refs past Z resolve (AA=27, AB=28)") {
    val wide: Seq[Seq[Either[String, Double]]] =
      Seq((1 to 28).map(c => Right(c.toDouble): Either[String, Double]))
    val cells = Archives.xlsxCells(Archives.writeXlsx(wide)).get
    assert(cells.exists(c => c.col == 27 && c.value == "27"))
    assert(cells.exists(c => c.col == 28 && c.value == "28"))
  }

  test("pptx slides round-trip, out-of-order members sort, hostile rejects") {
    val decks = Seq(
      Seq(Seq("one & only")),
      Seq(Seq("s1 p0", "s1 p1"), Seq("s2 <tagged>"), Seq()))
    for (slides <- decks) {
      val got = Archives.pptxSlides(Archives.writePptx(slides)).get
      assert(got.map(_._2) == slides, s"got $got")
      assert(got.map(_._1) == (1 to slides.size).toList)
    }
    // members stored out of order still sort by slide number
    val b = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(b)
    def entry(n: String, body: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(n)); z.write(body.getBytes); z.closeEntry()
    }
    entry("ppt/slides/slide2.xml", "<p:sld><a:t>two</a:t></p:sld>")
    entry("ppt/slides/slide10.xml", "<p:sld><a:t>ten</a:t></p:sld>")
    entry("ppt/slides/slide1.xml", "<p:sld><a:t>one</a:t></p:sld>")
    z.close()
    assert(Archives.pptxSlides(b.toByteArray).get.map(_._1) == Seq(1, 2, 10))
    assert(Archives.pptxSlides("junk".getBytes).isEmpty)
    assert(Archives.pptxSlides(Archives.writeXlsx(
      Seq(Seq(Right(1.0), Right(2.0)))) ).isEmpty, "xlsx has no slides")
  }

  test("hostile inputs reject as None, never throw") {
    val good = Archives.writeXlsx(Seq(Seq(Left("a"), Right(1.0))), _ => true)
    // truncated zip
    assert(Archives.xlsxCells(good.take(good.length / 2)).isEmpty)
    // junk bytes
    assert(Archives.xlsxCells("not a zip at all".getBytes).isEmpty)
    // zip without the sheet member
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("other.xml"))
    z.write("<x/>".getBytes); z.closeEntry(); z.close()
    assert(Archives.xlsxCells(bos.toByteArray).isEmpty)
    // dangling shared-string index: t="s" cell but empty sst
    val evil = {
      val b = new java.io.ByteArrayOutputStream()
      val zz = new java.util.zip.ZipOutputStream(b)
      zz.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
      zz.write("""<worksheet><sheetData><row r="1"><c r="A1" t="s"><v>5</v></c></row></sheetData></worksheet>""".getBytes)
      zz.closeEntry(); zz.close()
      b.toByteArray
    }
    assert(Archives.xlsxCells(evil).isEmpty)
    // bit-flip fuzz
    val rnd = new scala.util.Random(8181)
    for (_ <- 1 to 300) {
      val f = good.clone()
      val i = rnd.nextInt(f.length)
      f(i) = (f(i) ^ (1 << rnd.nextInt(8))).toByte
      Archives.xlsxCells(f)
    }
  }
}
