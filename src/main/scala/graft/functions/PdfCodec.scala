package graft.functions

/** PDF header census — version, page count, encryption flag from the
  * document structure (header line, the `/Type /Pages` tree root's
  * `/Count`, the trailer's `/Encrypt` entry), no content-stream
  * decoding. PDF is the dominant document format in real crawled
  * corpora; the census is the governance readout (version mix, page
  * volume for extraction budgeting, encrypted share routed to rejects)
  * that runs before any text-extraction pass.
  *
  * Parsing is the byte-regex walk a census can afford: object bodies
  * are scanned as ISO-8859-1 (PDF syntax is Latin-1-safe even when
  * streams are binary). Hostile input returns None. The writer emits
  * structurally complete PDFs — correct 10-digit xref offsets, catalog
  * → pages tree → page objects, trailer — the fixture source. */
object PdfCodec {

  final case class PdfMeta(version: String, nPages: Int, encrypted: Boolean)

  private val VersionRe = java.util.regex.Pattern.compile(
    "^%PDF-(\\d+\\.\\d+)")
  private val ObjRe = java.util.regex.Pattern.compile(
    "(?s)\\d+\\s+\\d+\\s+obj(.*?)endobj")
  private val CountRe = java.util.regex.Pattern.compile(
    "/Count\\s+(\\d+)")

  def meta(b: Array[Byte]): Option[PdfMeta] =
    try {
      if (b.length < 8) return None
      val s = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
      val vm = VersionRe.matcher(s)
      if (!vm.find()) return None
      val version = vm.group(1)
      // page count: the /Count of an object whose body declares
      // /Type /Pages (the page-tree root; intermediate nodes carry
      // partial counts but the root is the one the catalog references —
      // take the MAX count among /Pages nodes, which is the root's)
      var nPages = -1
      val om = ObjRe.matcher(s)
      while (om.find()) {
        val body = om.group(1)
        if (body.contains("/Type") && body.contains("/Pages")) {
          val cm = CountRe.matcher(body)
          if (cm.find()) nPages = math.max(nPages, cm.group(1).toInt)
        }
      }
      if (nPages < 0) return None
      // encryption: the trailer dictionary's /Encrypt entry
      val trailerAt = s.lastIndexOf("trailer")
      val encrypted = trailerAt >= 0 && s.indexOf("/Encrypt", trailerAt) >= 0
      Some(PdfMeta(version, nPages, encrypted))
    } catch {
      case scala.util.control.NonFatal(_) => None
    }

  // ------------------------------------------------- text extraction

  private val TjRe = java.util.regex.Pattern.compile(
    "\\(((?:\\\\.|[^\\\\)])*)\\)\\s*Tj")

  /** Unescape a PDF literal string: \( \) \\ and the common control
    * escapes. */
  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); case 'r' => sb.append('\r')
          case 't' => sb.append('\t')
          case other => sb.append(other)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** TEXT EXTRACTION over uncompressed content streams: every `(…) Tj`
    * show-text operator inside a BT…ET block, one concatenated string
    * per stream in document order — the minimal honest extractor for
    * the PDFs [[writePdfWithText]] emits (no font decoding, no
    * /Filter decompression: real-world compressed streams return what
    * their uncompressed operators expose, typically nothing — the
    * census routes those to the extraction engine proper). */
  def extractText(b: Array[Byte]): Option[Seq[String]] =
    try {
      if (meta(b).isEmpty) return None
      val s = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var at = 0
      while ({ val bt = s.indexOf("BT", at); bt >= 0 && {
        val et = s.indexOf("ET", bt)
        if (et < 0) false
        else {
          val block = s.substring(bt, et)
          val m = TjRe.matcher(block)
          val sb = new StringBuilder
          while (m.find()) sb.append(unescape(m.group(1)))
          out += sb.toString
          at = et + 2
          true
        }
      }}) ()
      Some(out.toSeq)
    } catch {
      case scala.util.control.NonFatal(_) => None
    }

  private def escape(s: String): String =
    s.flatMap {
      case '(' => "\\("; case ')' => "\\)"; case '\\' => "\\\\"
      case c => c.toString
    }

  /** Like [[writePdf]] but each page carries an UNCOMPRESSED content
    * stream showing `texts(p)` (escaped literal string + Tj) and a
    * shared Type1 font object — the extraction fixture. */
  def writePdfWithText(version: String, texts: Seq[String]): Array[Byte] = {
    val nPages = texts.length
    require(nPages >= 1 && nPages <= 999, s"bad page count $nPages")
    val sb = new StringBuilder
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def obj(body: String): Unit = {
      offsets += sb.length
      sb.append(s"${offsets.length} 0 obj\n$body\nendobj\n")
    }
    sb.append(s"%PDF-$version\n")
    obj("<< /Type /Catalog /Pages 2 0 R >>")
    val kids = (0 until nPages).map(k => s"${3 + k} 0 R").mkString(" ")
    obj(s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>")
    val fontObj = 3 + 2 * nPages
    for (k <- 0 until nPages)
      obj(s"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
        s"/Contents ${3 + nPages + k} 0 R " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> >>")
    for (t <- texts) {
      val stream = s"BT /F1 12 Tf 72 720 Td (${escape(t)}) Tj ET"
      obj(s"<< /Length ${stream.length} >>\nstream\n$stream\nendstream")
    }
    obj("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val xrefAt = sb.length
    sb.append(s"xref\n0 ${offsets.length + 1}\n")
    sb.append("0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\n")
    sb.append(s"startxref\n$xrefAt\n%%EOF\n")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** Structurally complete single-tree PDF: catalog, pages root with
    * `nPages` kids, empty pages, correct xref offsets, trailer
    * (optionally with a standard-security-handler stub + /Encrypt). */
  def writePdf(version: String, nPages: Int, encrypted: Boolean): Array[Byte] = {
    require(nPages >= 1 && nPages <= 999, s"bad page count $nPages")
    val sb = new StringBuilder
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def obj(body: String): Unit = {
      offsets += sb.length
      sb.append(s"${offsets.length} 0 obj\n$body\nendobj\n")
    }
    sb.append(s"%PDF-$version\n")
    obj("<< /Type /Catalog /Pages 2 0 R >>")
    val kids = (0 until nPages).map(k => s"${3 + k} 0 R").mkString(" ")
    obj(s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>")
    for (_ <- 0 until nPages)
      obj("<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] >>")
    if (encrypted)
      obj("<< /Filter /Standard /V 1 /R 2 /P -44 >>")
    val xrefAt = sb.length
    sb.append(s"xref\n0 ${offsets.length + 1}\n")
    sb.append("0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R")
    if (encrypted) sb.append(s" /Encrypt ${offsets.length} 0 R")
    sb.append(s" >>\nstartxref\n$xrefAt\n%%EOF\n")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }
}
