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

  private val LengthRe = java.util.regex.Pattern.compile(
    "/Length\\s+(\\d+)")

  /** zlib-inflate (RFC 1950 — PDF FlateDecode is zlib-wrapped) with a
    * 16 MiB output bound; None on corrupt data. */
  private def inflate(raw: Array[Byte]): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater(false)
    try {
      inf.setInput(raw)
      val out = new java.io.ByteArrayOutputStream(raw.length * 4 + 64)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        out.write(buf, 0, n)
        if (out.size > (1 << 24)) return None
      }
      Some(out.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, false)
    try {
      d.setInput(raw); d.finish()
      val out = new java.io.ByteArrayOutputStream(raw.length + 64)
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** Tj text of one decoded content stream: every `(…) Tj` inside a
    * BT…ET block, concatenated. */
  private def streamText(content: Array[Byte]): String = {
    val s = new String(content, java.nio.charset.StandardCharsets.ISO_8859_1)
    val sb = new StringBuilder
    var at = 0
    var bt = s.indexOf("BT", at)
    while (bt >= 0) {
      val et = s.indexOf("ET", bt)
      if (et < 0) bt = -1
      else {
        val m = TjRe.matcher(s.substring(bt, et))
        while (m.find()) sb.append(unescape(m.group(1)))
        at = et + 2
        bt = s.indexOf("BT", at)
      }
    }
    sb.toString
  }

  /** TEXT EXTRACTION as a stream-object walk: each `stream…endstream`
    * payload is sliced by `/Length` (falling back to an `endstream`
    * scan when the length is missing or lies), inflated when its
    * object dictionary declares `/Filter /FlateDecode` (zlib per the
    * PDF spec — the dominant real-world content-stream encoding), and
    * scanned for `(…) Tj` show-text inside BT…ET blocks. One
    * `(text, wasFlate)` entry per stream in document order — for the
    * PDFs [[writePdfWithText]] emits that is exactly page order. A
    * corrupt compressed stream rejects the whole document (None) so it
    * routes to the rejects channel rather than silently dropping
    * pages. */
  def extractPages(b: Array[Byte]): Option[Seq[(String, Boolean)]] =
    try {
      if (meta(b).isEmpty) return None
      val s = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
      val out = scala.collection.mutable.ArrayBuffer[(String, Boolean)]()
      var at = 0
      var si = s.indexOf("stream", at)
      while (si >= 0) {
        var ds = si + 6
        if (ds < s.length && s.charAt(ds) == '\r') ds += 1
        if (ds < s.length && s.charAt(ds) == '\n') {
          ds += 1
          val objAt = s.lastIndexOf(" obj", si)
          val dict = s.substring(math.max(objAt, 0), si)
          val isFlate = dict.contains("/FlateDecode")
          val lm = LengthRe.matcher(dict)
          val declared =
            if (lm.find()) lm.group(1).toLongOption else None
          // trust /Length only when `endstream` actually follows it
          val end = declared match {
            case Some(len) if len >= 0 && ds.toLong + len <= b.length &&
              { var p = ds + len.toInt
                while (p < s.length && (s.charAt(p) == '\r' || s.charAt(p) == '\n')) p += 1
                s.startsWith("endstream", p) } => ds + len.toInt
            case _ => s.indexOf("endstream", ds)
          }
          if (end < 0) return Some(out.toSeq) // truncated: keep prior pages
          // raw may carry EOL padding before `endstream`; the inflater
          // stops at the zlib stream's own end, so no trimming — and
          // none is SAFE: a trusted /Length slice ends in the Adler-32
          // trailer, whose last byte is 0x0A about 1 time in 256.
          val raw = java.util.Arrays.copyOfRange(b, ds, end)
          val content =
            if (isFlate) inflate(raw) match {
              case Some(c) => c
              case None => return None
            }
            else raw
          out += ((streamText(content), isFlate))
          at = math.max(end, ds) + 9
        } else at = si + 6
        si = s.indexOf("stream", at)
      }
      Some(out.toSeq)
    } catch {
      case scala.util.control.NonFatal(_) => None
    }

  /** Per-page text (compat shape over [[extractPages]]). */
  def extractText(b: Array[Byte]): Option[Seq[String]] =
    extractPages(b).map(_.map(_._1))

  private def escape(s: String): String =
    s.flatMap {
      case '(' => "\\("; case ')' => "\\)"; case '\\' => "\\\\"
      case c => c.toString
    }

  /** Like [[writePdf]] but each page carries a content stream showing
    * `texts(p)` (escaped literal string + Tj) and a shared Type1 font
    * object — the extraction fixture. With `flate` the content streams
    * are zlib-deflated and declare `/Filter /FlateDecode`, matching
    * the dominant real-world encoding; ISO-8859-1 is byte-transparent
    * so the binary payload survives the StringBuilder and the xref
    * offsets stay exact. */
  def writePdfWithText(version: String, texts: Seq[String],
      flate: Boolean = false): Array[Byte] = {
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
      val ops = s"BT /F1 12 Tf 72 720 Td (${escape(t)}) Tj ET"
      val stream =
        if (flate) new String(
          deflate(ops.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)),
          java.nio.charset.StandardCharsets.ISO_8859_1)
        else ops
      val filter = if (flate) " /Filter /FlateDecode" else ""
      obj(s"<< /Length ${stream.length}$filter >>\nstream\n$stream\nendstream")
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

  /** One extracted Image XObject: declared geometry, the filter that
    * wrapped it (`dct` = embedded JPEG verbatim, `flate` = zlib'd raw
    * RGB rows), and the UNWRAPPED payload (JPEG bytes / RGB bytes). */
  final case class PdfImage(filter: String, width: Int, height: Int,
                            payload: Array[Byte])

  /** IMAGE EXTRACTION — the multimodal half of the stream-object walk:
    * stream objects whose dictionary declares `/Subtype /Image` are
    * collected in document order. `/DCTDecode` images come back as the
    * verbatim JPEG bytes (how real PDFs embed photos — ready for
    * [[JpegCodec.decodePixels]]); `/FlateDecode` images are inflated
    * to raw 8-bit RGB rows per the declared geometry. Anything else
    * (CCITT, JBIG2, JPX) is skipped — census material, not decodable
    * here. A corrupt flate image rejects the document (None), same
    * contract as [[extractPages]]. */
  def extractImages(b: Array[Byte]): Option[Seq[PdfImage]] =
    try {
      if (meta(b).isEmpty) return None
      val s = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
      val wRe = java.util.regex.Pattern.compile("/Width\\s+(\\d+)")
      val hRe = java.util.regex.Pattern.compile("/Height\\s+(\\d+)")
      val out = scala.collection.mutable.ArrayBuffer[PdfImage]()
      var at = 0
      var si = s.indexOf("stream", at)
      while (si >= 0) {
        var ds = si + 6
        if (ds < s.length && s.charAt(ds) == '\r') ds += 1
        if (ds < s.length && s.charAt(ds) == '\n') {
          ds += 1
          val objAt = s.lastIndexOf(" obj", si)
          val dict = s.substring(math.max(objAt, 0), si)
          val lm = LengthRe.matcher(dict)
          val declared = if (lm.find()) lm.group(1).toLongOption else None
          val end = declared match {
            case Some(len) if len >= 0 && ds.toLong + len <= b.length &&
              { var p = ds + len.toInt
                while (p < s.length && (s.charAt(p) == '\r' || s.charAt(p) == '\n')) p += 1
                s.startsWith("endstream", p) } => ds + len.toInt
            case _ => s.indexOf("endstream", ds)
          }
          if (end < 0) return Some(out.toSeq)
          if (dict.contains("/Subtype /Image")) {
            val wm = wRe.matcher(dict); val hm = hRe.matcher(dict)
            if (wm.find() && hm.find()) {
              val w = wm.group(1).toInt; val h = hm.group(1).toInt
              val raw = java.util.Arrays.copyOfRange(b, ds, end)
              if (w > 0 && h > 0 && w.toLong * h <= (1L << 24)) {
                if (dict.contains("/DCTDecode"))
                  out += PdfImage("dct", w, h, raw)
                else if (dict.contains("/FlateDecode")) inflate(raw) match {
                  case Some(rgb) if rgb.length == 3 * w * h =>
                    out += PdfImage("flate", w, h, rgb)
                  case _ => return None
                }
                // other filters: skipped, not decodable here
              }
            }
          }
          at = math.max(end, ds) + 9
        } else at = si + 6
        si = s.indexOf("stream", at)
      }
      Some(out.toSeq)
    } catch {
      case scala.util.control.NonFatal(_) => None
    }

  /** Fixture/writer twin of [[extractImages]]: one page per image,
    * each drawing an Image XObject; `jpeg = Some(bytes)` embeds the
    * JPEG verbatim under `/DCTDecode`, `jpeg = None` deflates the
    * given raw RGB rows under `/FlateDecode`. */
  def writePdfWithImages(version: String,
      images: Seq[(Int, Int, Either[Array[Byte], Array[Byte]])]): Array[Byte] = {
    // Left = raw RGB rows (flate), Right = JPEG bytes (dct)
    val nPages = images.length
    require(nPages >= 1 && nPages <= 999, s"bad image count $nPages")
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
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
    for (k <- 0 until nPages)
      obj(s"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
        s"/Contents ${3 + nPages + k} 0 R " +
        s"/Resources << /XObject << /Im0 ${3 + 2 * nPages + k} 0 R >> >> >>")
    for (_ <- images) {
      val ops = "q 200 0 0 200 100 400 cm /Im0 Do Q"
      obj(s"<< /Length ${ops.length} >>\nstream\n$ops\nendstream")
    }
    for ((w, h, img) <- images) {
      val (filter, payload) = img match {
        case Left(rgb) =>
          require(rgb.length == 3 * w * h, "bad rgb size")
          ("/FlateDecode", deflate(rgb))
        case Right(jpeg) => ("/DCTDecode", jpeg)
      }
      val stream = new String(payload, iso)
      obj(s"<< /Type /XObject /Subtype /Image /Width $w /Height $h " +
        s"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter $filter " +
        s"/Length ${stream.length} >>\nstream\n$stream\nendstream")
    }
    val xrefAt = sb.length
    sb.append(s"xref\n0 ${offsets.length + 1}\n")
    sb.append("0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\n")
    sb.append(s"startxref\n$xrefAt\n%%EOF\n")
    sb.toString.getBytes(iso)
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
