package graft

import graft.functions.PdfCodec

/** Show-text depth laws: TJ arrays with kerning, hex strings, octal
  * escapes, nested parens, WinAnsi and ToUnicode-CMap fonts — the
  * spellings real PDFs overwhelmingly use (no PDF reference tool
  * exists in this container, so the gates are round-trip + hand-built
  * structural cases + hostile fuzz). */
class Round10PdfSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("TJ-array writer round-trips incl WinAnsi remaps, flate on/off") {
    val texts = Seq(
      "alpha beta gamma delta",
      "cost €42 and ™ brand (quoted) back\\slash",
      "one",
      "€ leading and trailing ™")
    for (flate <- Seq(false, true)) {
      val pdf = PdfCodec.writePdfTjText("1.7", texts, flate)
      assert(PdfCodec.meta(pdf).exists(_.nPages == 4))
      val got = PdfCodec.extractText(pdf)
      assert(got.isDefined, s"flate=$flate did not extract")
      assert(got.get == texts, s"flate=$flate texts differ: ${got.get}")
    }
  }

  test("ToUnicode CMap resolves codes, multi-codepoint ligature included") {
    val texts = Seq("fi doc λΩ fin final", "office traffic fix", "πλain")
    val pdf = PdfCodec.writePdfCmapText("1.6", texts)
    val got = PdfCodec.extractText(pdf)
    assert(got.isDefined)
    assert(got.get == texts, s"got ${got.get}")
  }

  test("hand-built stream: nested parens, octal, hex Tj, quote operators") {
    // raw content ops exercising literal-string corners the escaping
    // writer never emits
    val ops = "BT /F1 9 Tf " +
      "(nested ((deep) here)) Tj " +
      "(octal \\101\\102\\103 done) Tj " +
      "<48454C4C4F> Tj " +
      "(line1) ' " +
      "[ (a) -500 (b) -50 (c) ] TJ " +
      "ET"
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
      s"4 0 obj\n<< /Length ${ops.length} >>\nstream\n$ops\nendstream\nendobj\n" +
      "trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val got = PdfCodec.extractText(pdf).get
    assert(got == Seq("nested ((deep) here)" +
      "octal ABC done" + "HELLO" + "line1" + "a bc"), s"got $got")
  }

  test("legacy Tj writer output is unchanged by the parser rewrite") {
    val texts = Seq("page 0 (formula) q\\end", "plain second page")
    for (flate <- Seq(false, true)) {
      val pdf = PdfCodec.writePdfWithText("1.5", texts, flate)
      assert(PdfCodec.extractText(pdf).contains(texts), s"flate=$flate")
    }
  }

  test("rich-writer fuzz: bit flips never throw") {
    val pdf = PdfCodec.writePdfTjText("1.7",
      Seq("fuzz target €money page", "two ™"), flate = true)
    val cmap = PdfCodec.writePdfCmapText("1.6", Seq("fi λ fuzz"))
    val rnd = new scala.util.Random(4242)
    for (base <- Seq(pdf, cmap); _ <- 1 to 400) {
      val f = base.clone()
      val i = rnd.nextInt(f.length)
      f(i) = (f(i) ^ (1 << rnd.nextInt(8))).toByte
      PdfCodec.extractText(f) // Option, never throws
      PdfCodec.meta(f)
    }
  }
}
