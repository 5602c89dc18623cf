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

  private final class Bail extends RuntimeException
    with scala.util.control.NoStackTrace
  private def bail(): Nothing = throw new Bail

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
      def scanPages(text: String): Unit = {
        val om = ObjRe.matcher(text)
        while (om.find()) {
          val body = om.group(1)
          if (body.contains("/Type") && body.contains("/Pages")) {
            val cm = CountRe.matcher(body)
            if (cm.find()) nPages = math.max(nPages, cm.group(1).toInt)
          }
        }
      }
      scanPages(s)
      // PDF 1.5+: the page tree root may live inside an object stream
      if (nPages < 0 && s.contains("/ObjStm"))
        scanPages(expandObjectStreams(b, s))
      if (nPages < 0) return None
      // encryption: the trailer dictionary's /Encrypt entry (xref-stream
      // documents have no `trailer` keyword — the entry lives in the
      // xref stream's own dictionary)
      val trailerAt = s.lastIndexOf("trailer")
      val encrypted =
        if (trailerAt >= 0) s.indexOf("/Encrypt", trailerAt) >= 0
        else xrefStreamDictEncrypt(s)
      Some(PdfMeta(version, nPages, encrypted))
    } catch {
      case scala.util.control.NonFatal(_) => None
    }

  /** Whether any xref-STREAM dictionary in the `startxref`→`/Prev`
    * chain carries `/Encrypt`. Scoped to the dict slices the xref walk
    * itself uses (offset → the following `stream` keyword), never the
    * whole byte string — page content or comments that merely mention
    * "/Encrypt" must not flip the census flag. */
  private def xrefStreamDictEncrypt(s: String): Boolean = {
    val sx = s.lastIndexOf("startxref")
    if (sx < 0) return false
    val om = java.util.regex.Pattern.compile("startxref\\s+(\\d+)").matcher(s)
    if (!om.find(sx)) return false
    var off = om.group(1).toLong
    val prevRe = java.util.regex.Pattern.compile("/Prev\\s+(\\d+)")
    var hops = 0
    while (off >= 0 && off < s.length && hops < 8) {
      hops += 1
      val si = s.indexOf("stream", off.toInt)
      if (si < 0) return false
      val dict = s.substring(off.toInt, si)
      if (!dict.contains("/XRef")) return false
      if (dict.contains("/Encrypt")) return true
      val pm = prevRe.matcher(dict)
      off = if (pm.find()) pm.group(1).toLong else -1L
    }
    false
  }

  // ------------------------------------------------- text extraction

  /** WinAnsiEncoding's 0x80–0x9F remaps (the rest is Latin-1 identity). */
  private val WinAnsiHigh: Map[Int, Char] = Map(
    0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ', 0x84 -> '„',
    0x85 -> '…', 0x86 -> '†', 0x87 -> '‡', 0x88 -> 'ˆ',
    0x89 -> '‰', 0x8a -> 'Š', 0x8b -> '‹', 0x8c -> 'Œ',
    0x8e -> 'Ž', 0x91 -> '‘', 0x92 -> '’', 0x93 -> '“',
    0x94 -> '”', 0x95 -> '•', 0x96 -> '–', 0x97 -> '—',
    0x98 -> '˜', 0x99 -> '™', 0x9a -> 'š', 0x9b -> '›',
    0x9c -> 'œ', 0x9e -> 'ž', 0x9f -> 'Ÿ')

  /** Inverse for the fixture writer. */
  private val WinAnsiInverse: Map[Char, Int] = WinAnsiHigh.map(_.swap)

  private val IdentityDec: Int => String = c => c.toChar.toString
  private val WinAnsiDec: Int => String =
    c => WinAnsiHigh.getOrElse(c, c.toChar).toString

  /** A TJ kerning number whose magnitude exceeds this is treated as an
    * inter-word gap and re-emitted as one space (thousandths of an em;
    * real text extractors use the same order of magnitude). */
  private val KernSpace = 100.0

  /** Font resource name → byte-code decoder, built from a whole-document
    * object scan: `/Font << /F1 9 0 R >>` resource entries resolved to
    * font objects; `/Encoding /WinAnsiEncoding` and `/ToUnicode N 0 R`
    * CMaps (bfchar + bfrange, UTF-16BE targets) are honored, anything
    * else decodes as Latin-1 identity. Resource names are collected
    * document-wide — pages with CONFLICTING bindings for the same name
    * are out of scope (last binding wins), stated here honestly. */
  private def fontDecoders(s: String): Map[String, Int => String] = {
    val objRe = java.util.regex.Pattern.compile("(?s)(\\d+)\\s+\\d+\\s+obj(.*?)endobj")
    val objs = scala.collection.mutable.Map[Int, String]()
    val om = objRe.matcher(s)
    while (om.find()) objs(om.group(1).toInt) = om.group(2)
    // ToUnicode CMap: code -> text
    def cmapOf(body: String): Option[Int => String] = {
      val entries = scala.collection.mutable.Map[Int, String]()
      def utf16(hex: String): String = {
        val units = hex.grouped(4).map(Integer.parseInt(_, 16).toChar).toArray
        new String(units)
      }
      val charRe = java.util.regex.Pattern.compile(
        "(?s)beginbfchar(.*?)endbfchar")
      val pairRe = java.util.regex.Pattern.compile(
        "<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>")
      val cm = charRe.matcher(body)
      while (cm.find()) {
        val pm = pairRe.matcher(cm.group(1))
        while (pm.find())
          entries(Integer.parseInt(pm.group(1), 16)) = utf16(pm.group(2))
      }
      val rangeRe = java.util.regex.Pattern.compile(
        "(?s)beginbfrange(.*?)endbfrange")
      val tripleRe = java.util.regex.Pattern.compile(
        "<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>")
      val rm = rangeRe.matcher(body)
      while (rm.find()) {
        val tm = tripleRe.matcher(rm.group(1))
        while (tm.find()) {
          val lo = Integer.parseInt(tm.group(1), 16)
          val hi = Integer.parseInt(tm.group(2), 16)
          val st = Integer.parseInt(tm.group(3), 16)
          if (hi - lo <= 0xffff) {
            var c = lo
            while (c <= hi) { entries(c) = (st + (c - lo)).toChar.toString; c += 1 }
          }
        }
      }
      if (entries.isEmpty) None
      else Some(c => entries.getOrElse(c, c.toChar.toString))
    }
    def decoderFor(fontBody: String): Int => String = {
      val tuRe = java.util.regex.Pattern.compile("/ToUnicode\\s+(\\d+)\\s+0\\s+R")
      val tm = tuRe.matcher(fontBody)
      if (tm.find()) {
        objs.get(tm.group(1).toInt).flatMap(cmapOf).getOrElse(IdentityDec)
      } else if (fontBody.contains("/WinAnsiEncoding")) WinAnsiDec
      else IdentityDec
    }
    val out = scala.collection.mutable.Map[String, Int => String]()
    val resRe = java.util.regex.Pattern.compile("(?s)/Font\\s*<<(.*?)>>")
    val entRe = java.util.regex.Pattern.compile("/(\\w+)\\s+(\\d+)\\s+0\\s+R")
    val rm = resRe.matcher(s)
    while (rm.find()) {
      val em = entRe.matcher(rm.group(1))
      while (em.find()) {
        val name = em.group(1)
        objs.get(em.group(2).toInt).foreach(b => out(name) = decoderFor(b))
      }
    }
    out.toMap
  }

  private val LengthRe = java.util.regex.Pattern.compile(
    "/Length\\s+(\\d+)")

  private val XrefTypeRe = java.util.regex.Pattern.compile(
    "/Type\\s*/XRef\\b")

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

  /** Show-text of one decoded content stream: an operator-level walk of
    * BT…ET blocks covering how real PDFs actually emit text —
    * `(…) Tj`, hex-string `<…> Tj`, the `'`/`"` show-with-line-move
    * forms, and `[ (…) -250 <…> ] TJ` arrays where kerning numbers
    * larger than [[KernSpace]] re-emit as one space. Literal strings
    * handle balanced nested parens, octal `\ooo` escapes, and
    * backslash-EOL continuations; string BYTES are mapped through the
    * current `Tf` font's decoder (WinAnsi / ToUnicode CMap /
    * Latin-1). */
  private def streamText(content: Array[Byte],
                         fonts: Map[String, Int => String]): String = {
    val s = new String(content, java.nio.charset.StandardCharsets.ISO_8859_1)
    val sb = new StringBuilder
    var cur: Int => String = IdentityDec
    var inText = false
    var lastName = ""
    var pendStr: Array[Int] = null
    var pendArr: List[Either[Array[Int], Double]] = null
    var i = 0
    val n = s.length

    // literal string starting at '(' — returns (byte codes, index after ')')
    def literal(from: Int): (Array[Int], Int) = {
      val out = scala.collection.mutable.ArrayBuffer[Int]()
      var depth = 1
      var j = from + 1
      while (j < n && depth > 0) {
        val c = s.charAt(j)
        if (c == '\\' && j + 1 < n) {
          val e = s.charAt(j + 1)
          e match {
            case 'n' => out += '\n'; j += 2
            case 'r' => out += '\r'; j += 2
            case 't' => out += '\t'; j += 2
            case 'b' => out += '\b'; j += 2
            case 'f' => out += '\f'; j += 2
            case '\n' => j += 2 // line continuation
            case '\r' =>
              j += 2; if (j < n && s.charAt(j) == '\n') j += 1
            case d if d >= '0' && d <= '7' =>
              var v = 0; var k = 0; j += 1
              while (k < 3 && j < n && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
                v = v * 8 + (s.charAt(j) - '0'); j += 1; k += 1
              }
              out += (v & 0xff)
            case other => out += other.toInt; j += 2
          }
        } else {
          if (c == '(') { depth += 1; out += c.toInt }
          else if (c == ')') { depth -= 1; if (depth > 0) out += c.toInt }
          else out += c.toInt
          j += 1
        }
      }
      (out.toArray, j)
    }

    // hex string starting at '<' — returns (byte codes, index after '>')
    def hexStr(from: Int): (Array[Int], Int) = {
      val digits = new StringBuilder
      var j = from + 1
      while (j < n && s.charAt(j) != '>') {
        val c = s.charAt(j)
        if (!c.isWhitespace) digits.append(c)
        j += 1
      }
      if (digits.length % 2 == 1) digits.append('0') // odd count pads 0
      val out = digits.toString.grouped(2)
        .flatMap(h => scala.util.Try(Integer.parseInt(h, 16)).toOption)
        .toArray
      (out, j + 1)
    }

    def emit(codes: Array[Int]): Unit = codes.foreach(c => sb.append(cur(c)))

    while (i < n) {
      val c = s.charAt(i)
      if (c == '(') {
        val (codes, ni) = literal(i)
        if (pendArr != null) pendArr = Left(codes) :: pendArr else pendStr = codes
        i = ni
      } else if (c == '<' && i + 1 < n && s.charAt(i + 1) == '<') {
        i += 2 // dictionary open — skip the token, not the contents
      } else if (c == '<') {
        val (codes, ni) = hexStr(i)
        if (pendArr != null) pendArr = Left(codes) :: pendArr else pendStr = codes
        i = ni
      } else if (c == '[') {
        pendArr = Nil; i += 1
      } else if (c == ']') {
        i += 1 // operator (TJ) consumes the finished array
      } else if (c == '/') {
        val st = i + 1
        var j = st
        while (j < n && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')) j += 1
        lastName = s.substring(st, j)
        i = j
      } else if ((c >= '0' && c <= '9') || c == '-' || c == '+' || c == '.') {
        var j = i + 1
        while (j < n && ((s.charAt(j) >= '0' && s.charAt(j) <= '9') || s.charAt(j) == '.')) j += 1
        if (pendArr != null)
          s.substring(i, j).toDoubleOption.foreach(v => pendArr = Right(v) :: pendArr)
        i = j
      } else if (c.isLetter || c == '\'' || c == '"') {
        var j = i + 1
        while (j < n && (s.charAt(j).isLetter || s.charAt(j) == '*')) j += 1
        val op = s.substring(i, j)
        op match {
          case "BT" => inText = true
          case "ET" => inText = false
          case "Tf" => cur = fonts.getOrElse(lastName, IdentityDec)
          case "Tj" | "'" | "\"" =>
            if (inText && pendStr != null) emit(pendStr)
            pendStr = null
          case "TJ" =>
            if (inText && pendArr != null)
              pendArr.reverse.foreach {
                case Left(codes) => emit(codes)
                case Right(v) => if (math.abs(v) > KernSpace) sb.append(' ')
              }
            pendArr = null
          case _ => ()
        }
        i = j
      } else i += 1
    }
    sb.toString
  }

  /** Iterate stream objects as `(dictText, dataStart, dataEnd)` — the
    * `/Length`-trusted-else-scan slicing shared by the extractors. */
  private def forEachStream(b: Array[Byte], s: String)
                           (f: (String, Int, Int) => Unit): Unit = {
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
        if (end < 0) return
        f(dict, ds, end)
        at = math.max(end, ds) + 9
      } else at = si + 6
      si = s.indexOf("stream", at)
    }
  }

  // -------------------------------------- object streams (PDF 1.5+)
  //
  // Post-2005 PDFs pack their non-stream objects (catalog, page dicts,
  // FONT dicts) into flate-compressed `/Type /ObjStm` containers and
  // index them through xref STREAMS instead of the classic table. The
  // round-10 whole-document object scan could not see inside those, so
  // its TJ/CMap depth was capped on real files; the expansion below
  // re-materializes every packed object as top-level text so the same
  // scan covers both worlds.

  /** Inflate each `/Type /ObjStm` stream and append its members as
    * `N 0 obj … endobj` text: the ObjStm layout is `/N` pairs of
    * `objnum offset` in the header, bodies from `/First` on. Malformed
    * object streams contribute nothing (the rest of the document still
    * parses). */
  private[functions] def expandObjectStreams(b: Array[Byte], s: String): String = {
    if (!s.contains("/ObjStm")) return s
    val sb = new StringBuilder(s)
    val nRe = java.util.regex.Pattern.compile("/N\\s+(\\d+)")
    val fRe = java.util.regex.Pattern.compile("/First\\s+(\\d+)")
    forEachStream(b, s) { (dict, ds, end) =>
      if (dict.contains("/ObjStm")) {
        val raw = java.util.Arrays.copyOfRange(b, ds, end)
        val content =
          if (dict.contains("/FlateDecode")) inflate(raw).getOrElse(Array.emptyByteArray)
          else raw
        val cs = new String(content, java.nio.charset.StandardCharsets.ISO_8859_1)
        val nm = nRe.matcher(dict)
        val fm = fRe.matcher(dict)
        if (nm.find() && fm.find()) {
          val n = nm.group(1).toInt
          val first = fm.group(1).toInt
          if (n > 0 && n <= 10000 && first >= 0 && first <= cs.length) {
            val header = cs.substring(0, first).trim
              .split("\\s+").filter(_.nonEmpty)
            if (header.length >= 2 * n) {
              val nums = (0 until n).map(i => header(2 * i).toLongOption)
              val offs = (0 until n).map(i => header(2 * i + 1).toIntOption)
              if (nums.forall(_.isDefined) && offs.forall(_.isDefined)) {
                var i = 0
                while (i < n) {
                  val st = first + offs(i).get
                  val en = if (i + 1 < n) first + offs(i + 1).get else cs.length
                  if (st >= 0 && st <= en && en <= cs.length)
                    sb.append(s"\n${nums(i).get} 0 obj\n" +
                      cs.substring(st, en).trim + "\nendobj\n")
                  i += 1
                }
              }
            }
          }
        }
      }
    }
    sb.toString
  }

  /** One xref-stream row: type 0 = free, 1 = at byte offset `fieldB`,
    * 2 = object `fieldC`-th member of object stream `fieldB`. */
  final case class XrefEntry(entryType: Int, fieldB: Long, fieldC: Long)

  /** Parse the xref STREAM chain from `startxref`: `/W`-array field
    * widths (big-endian), `/Index` subsections (default `[0 /Size]`),
    * `/Prev` hops (newest entry wins, ≤ 8 hops). None when the tail
    * points at a classic `xref` table or anything malformed — callers
    * fall back to the linear object scan. */
  def xrefStreamEntries(b: Array[Byte]): Option[Map[Long, XrefEntry]] =
    try {
      val s = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
      val sx = s.lastIndexOf("startxref")
      if (sx < 0) return None
      val om = java.util.regex.Pattern
        .compile("startxref\\s+(\\d+)").matcher(s)
      if (!om.find(sx)) return None
      var off = om.group(1).toLong
      val out = scala.collection.mutable.Map[Long, XrefEntry]()
      val wRe = java.util.regex.Pattern
        .compile("/W\\s*\\[\\s*(\\d+)\\s+(\\d+)\\s+(\\d+)\\s*\\]")
      val sizeRe = java.util.regex.Pattern.compile("/Size\\s+(\\d+)")
      val idxRe = java.util.regex.Pattern.compile("/Index\\s*\\[([^\\]]*)\\]")
      val prevRe = java.util.regex.Pattern.compile("/Prev\\s+(\\d+)")
      var hops = 0
      while (off >= 0 && off < b.length && hops < 8) {
        hops += 1
        val si = s.indexOf("stream", off.toInt)
        if (si < 0) return if (out.isEmpty) None else Some(out.toMap)
        val dict = s.substring(off.toInt, si)
        if (!dict.contains("/XRef"))
          return if (out.isEmpty) None else Some(out.toMap)
        val wm = wRe.matcher(dict)
        val sm = sizeRe.matcher(dict)
        if (!wm.find() || !sm.find()) return None
        val wa = wm.group(1).toInt
        val wb = wm.group(2).toInt
        val wc = wm.group(3).toInt
        if (wa > 8 || wb > 8 || wc > 8 || wa + wb + wc == 0) return None
        val size = sm.group(1).toLong
        val im = idxRe.matcher(dict)
        val index: Seq[Long] =
          if (im.find()) im.group(1).trim.split("\\s+")
            .filter(_.nonEmpty).toSeq.map(_.toLong)
          else Seq(0L, size)
        if (index.length % 2 != 0) return None
        // slice this one stream (same /Length discipline as the walk)
        var ds = si + 6
        if (ds < s.length && s.charAt(ds) == '\r') ds += 1
        if (ds >= s.length || s.charAt(ds) != '\n') return None
        ds += 1
        val lm = LengthRe.matcher(dict)
        val end = (if (lm.find()) lm.group(1).toLongOption else None) match {
          case Some(len) if len >= 0 && ds.toLong + len <= b.length &&
            { var p = ds + len.toInt
              while (p < s.length && (s.charAt(p) == '\r' || s.charAt(p) == '\n')) p += 1
              s.startsWith("endstream", p) } => ds + len.toInt
          case _ => s.indexOf("endstream", ds)
        }
        if (end < 0) return None
        val raw = java.util.Arrays.copyOfRange(b, ds, end)
        val rows =
          if (dict.contains("/FlateDecode")) inflate(raw).getOrElse(return None)
          else raw
        val rowLen = wa + wb + wc
        var p = 0
        def be(at: Int, n: Int): Long = {
          var v = 0L
          var i = 0
          while (i < n) { v = (v << 8) | (rows(at + i) & 0xffL); i += 1 }
          v
        }
        index.grouped(2).foreach { case Seq(start, count) =>
          if (count < 0 || count > 1000000) return None
          var i = 0L
          while (i < count) {
            if (p + rowLen > rows.length) return None
            val tpe = if (wa == 0) 1 else be(p, wa).toInt
            val f2 = be(p + wa, wb)
            val f3 = be(p + wa + wb, wc)
            val num = start + i
            if (!out.contains(num)) out(num) = XrefEntry(tpe, f2, f3)
            p += rowLen
            i += 1
          }
        }
        val pm = prevRe.matcher(dict)
        off = if (pm.find()) pm.group(1).toLong else -1L
      }
      if (out.isEmpty) None else Some(out.toMap)
    } catch {
      case scala.util.control.NonFatal(_) => None
    }

  // ------------------------------------- incremental updates (revisions)
  //
  // Edited PDFs are APPENDED to, never rewritten: the update re-emits
  // changed objects under their ORIGINAL numbers at new offsets and adds
  // a new xref section whose /Prev points at the previous one. A linear
  // stream walk then sees BOTH revisions of a replaced page (stale text,
  // duplicated rows); only newest-wins resolution through the xref chain
  // extracts the document the user actually sees. [[xrefStreamEntries]]
  // already folds the chain newest-first; the walk below resolves
  // catalog → pages → kids → contents through it.

  /** Dictionary text of object `num` via the xref chain: type-1 rows
    * parse at their byte offset (up to `stream`/`endobj`), type-2 rows
    * re-materialize their object-stream member. */
  private def objDictAt(b: Array[Byte], s: String,
                        entries: Map[Long, XrefEntry],
                        num: Long): Option[String] = {
    entries.get(num).flatMap {
      case XrefEntry(1, off, _) if off >= 0 && off < b.length =>
        val at = off.toInt
        val endObj = s.indexOf("endobj", at)
        val streamAt = s.indexOf("stream", at)
        if (endObj < 0) None
        else {
          val end = if (streamAt >= 0 && streamAt < endObj) streamAt else endObj
          Some(s.substring(at, end))
        }
      case XrefEntry(2, stmNum, idx) =>
        // inflate the container object stream and take member `idx`
        entries.get(stmNum).collect { case XrefEntry(1, off, _) => off }
          .flatMap { off =>
            val at = off.toInt
            val si = s.indexOf("stream", at)
            if (si < 0) return None
            val dict = s.substring(at, si)
            if (!dict.contains("/ObjStm")) return None
            var ds = si + 6
            if (ds < s.length && s.charAt(ds) == '\r') ds += 1
            if (ds >= s.length || s.charAt(ds) != '\n') return None
            ds += 1
            val lm = LengthRe.matcher(dict)
            val end = (if (lm.find()) lm.group(1).toLongOption else None) match {
              case Some(len) if len >= 0 && ds.toLong + len <= b.length =>
                ds + len.toInt
              case _ => s.indexOf("endstream", ds)
            }
            if (end < 0) return None
            val raw = java.util.Arrays.copyOfRange(b, ds, end)
            val content =
              if (dict.contains("/FlateDecode")) inflate(raw).getOrElse(return None)
              else raw
            val cs = new String(content,
              java.nio.charset.StandardCharsets.ISO_8859_1)
            val nm = java.util.regex.Pattern.compile("/N\\s+(\\d+)").matcher(dict)
            val fm = java.util.regex.Pattern.compile("/First\\s+(\\d+)").matcher(dict)
            if (!nm.find() || !fm.find()) return None
            val n = nm.group(1).toInt
            val first = fm.group(1).toInt
            if (idx < 0 || idx >= n || first > cs.length) return None
            val header = cs.substring(0, first).trim.split("\\s+")
            if (header.length < 2 * n) return None
            val offs = (0 until n).map(i => header(2 * i + 1).toIntOption
              .getOrElse(return None))
            val st = first + offs(idx.toInt)
            val en = if (idx.toInt + 1 < n) first + offs(idx.toInt + 1)
              else cs.length
            if (st < 0 || st > en || en > cs.length) None
            else Some(cs.substring(st, en))
          }
      case _ => None
    }
  }

  /** Content-stream bytes of object `num` (type-1 entries only — the
    * spec forbids streams inside object streams), inflated if flate. */
  private def contentBytesAt(b: Array[Byte], s: String,
                             entries: Map[Long, XrefEntry],
                             num: Long): Option[Array[Byte]] =
    entries.get(num).collect { case XrefEntry(1, off, _) => off }
      .flatMap { off =>
        val at = off.toInt
        val si = s.indexOf("stream", at)
        val endObj = s.indexOf("endobj", at)
        if (si < 0 || (endObj >= 0 && endObj < si)) return None
        val dict = s.substring(at, si)
        var ds = si + 6
        if (ds < s.length && s.charAt(ds) == '\r') ds += 1
        if (ds >= s.length || s.charAt(ds) != '\n') return None
        ds += 1
        val lm = LengthRe.matcher(dict)
        val end = (if (lm.find()) lm.group(1).toLongOption else None) match {
          case Some(len) if len >= 0 && ds.toLong + len <= b.length &&
            { var p = ds + len.toInt
              while (p < s.length && (s.charAt(p) == '\r' || s.charAt(p) == '\n')) p += 1
              s.startsWith("endstream", p) } => ds + len.toInt
          case _ => s.indexOf("endstream", ds)
        }
        if (end < 0) return None
        val raw = java.util.Arrays.copyOfRange(b, ds, end)
        if (dict.contains("/FlateDecode")) inflate(raw) else Some(raw)
      }

  private val RefRe = java.util.regex.Pattern.compile("(\\d+)\\s+0\\s+R")

  /** REVISION-AWARE text extraction: page text in page-tree order with
    * every object resolved newest-wins through the xref-stream chain —
    * replaced pages read their CURRENT revision exactly once, appended
    * pages appear, stale revisions never leak (the linear walk's
    * failure mode on edited documents). Fonts resolve via the expanded
    * linear scan (append order = last-wins, which IS the incremental
    * semantic for dictionaries). None for classic-xref or malformed
    * chains — callers fall back to [[extractText]]. */
  def extractTextIncremental(b: Array[Byte]): Option[Seq[String]] =
    try {
      val entries = xrefStreamEntries(b).getOrElse(return None)
      val s = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
      val fonts = fontDecoders(expandObjectStreams(b, s))
      // /Root lives in the NEWEST xref stream's dict
      val sx = s.lastIndexOf("startxref")
      if (sx < 0) return None
      val om = java.util.regex.Pattern
        .compile("startxref\\s+(\\d+)").matcher(s)
      if (!om.find(sx)) return None
      val xrefOff = om.group(1).toLong.toInt
      if (xrefOff < 0 || xrefOff >= b.length) return None
      val xrefDictEnd = s.indexOf("stream", xrefOff)
      if (xrefDictEnd < 0) return None
      val rootM = java.util.regex.Pattern
        .compile("/Root\\s+(\\d+)\\s+0\\s+R")
        .matcher(s.substring(xrefOff, xrefDictEnd))
      if (!rootM.find()) return None
      val catalog = objDictAt(b, s, entries, rootM.group(1).toLong)
        .getOrElse(return None)
      val pagesM = java.util.regex.Pattern
        .compile("/Pages\\s+(\\d+)\\s+0\\s+R").matcher(catalog)
      if (!pagesM.find()) return None
      // walk the page tree (depth-first; fixtures are flat but
      // intermediate /Pages nodes resolve too)
      val out = Seq.newBuilder[String]
      var visited = 0
      def walk(num: Long): Unit = {
        visited += 1
        if (visited > 10000) bail()
        val dict = objDictAt(b, s, entries, num).getOrElse(bail())
        if (dict.contains("/Pages") || dict.contains("/Kids")) {
          val kidsM = java.util.regex.Pattern
            .compile("(?s)/Kids\\s*\\[([^\\]]*)\\]").matcher(dict)
          if (kidsM.find()) {
            val rm = RefRe.matcher(kidsM.group(1))
            while (rm.find()) walk(rm.group(1).toLong)
          }
        } else {
          val cm = java.util.regex.Pattern
            .compile("/Contents\\s+(\\d+)\\s+0\\s+R").matcher(dict)
          if (cm.find()) {
            val bytes = contentBytesAt(b, s, entries, cm.group(1).toLong)
              .getOrElse(bail())
            out += streamText(bytes, fonts)
          } else out += ""
        }
      }
      walk(pagesM.group(1).toLong)
      val pages = out.result()
      if (pages.isEmpty) None else Some(pages)
    } catch {
      case _: Bail => None
      case scala.util.control.NonFatal(_) => None
    }

  /** Append an incremental UPDATE to a [[writePdfObjStm]] document:
    * page 0's content stream is REPLACED (same object number, new
    * offset) and one page is APPENDED (new content + page dict, pages
    * root re-emitted with the extra kid under its original number).
    * The update's xref stream covers only the touched numbers via
    * /Index subsections and chains back with /Prev — the layout every
    * save-in-place editor produces. Update streams show plain literal
    * text (no font switch), so they read through the identity decoder
    * while base pages keep their CMap font. */
  def writePdfIncrementalUpdate(base: Array[Byte], nPages: Int,
                                revisedText: String,
                                appendedText: String): Array[Byte] = {
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val s = new String(base, iso)
    val sx = s.lastIndexOf("startxref")
    require(sx >= 0, "base has no startxref")
    val om = java.util.regex.Pattern.compile("startxref\\s+(\\d+)").matcher(s)
    require(om.find(sx), "unparsable startxref")
    val prevXref = om.group(1).toLong
    // base numbering per writePdfObjStm
    val pagesNum = nPages + 4
    val contents0 = 1L // page 0's content stream
    val size = 2 * nPages + 7
    val newContentNum = size // appended page's content stream
    val newPageNum = size + 1 // appended page dict
    val xrefNum = 2 * nPages + 6 // re-emitted under its original number
    val sb = new StringBuilder
    val offsets = scala.collection.mutable.Map[Long, Long]()
    def obj(num: Long, body: String): Unit = {
      offsets(num) = base.length.toLong + sb.length
      sb.append(s"$num 0 obj\n$body\nendobj\n")
    }
    sb.append("\n")
    val rev = s"BT 72 720 Td (${escape(revisedText)}) Tj ET"
    obj(contents0, s"<< /Length ${rev.length} >>\nstream\n$rev\nendstream")
    val app = s"BT 72 720 Td (${escape(appendedText)}) Tj ET"
    obj(newContentNum,
      s"<< /Length ${app.length} >>\nstream\n$app\nendstream")
    obj(newPageNum, s"<< /Type /Page /Parent $pagesNum 0 R " +
      s"/MediaBox [ 0 0 612 792 ] /Contents $newContentNum 0 R >>")
    val kids = ((0 until nPages).map(k => s"${nPages + 5 + k} 0 R") :+
      s"$newPageNum 0 R").mkString(" ")
    obj(pagesNum,
      s"<< /Type /Pages /Kids [ $kids ] /Count ${nPages + 1} >>")
    // update xref stream: /Index subsections for the touched numbers
    val xrefAt = base.length.toLong + sb.length
    offsets(xrefNum) = xrefAt
    val touched = Seq(contents0, pagesNum, xrefNum, newContentNum, newPageNum)
    val index = touched.sorted.map(n => s"$n 1").mkString(" ")
    val rows = new java.io.ByteArrayOutputStream()
    touched.sorted.foreach { n =>
      rows.write(1)
      val off = offsets(n)
      for (i <- 3 to 0 by -1) rows.write(((off >> (8 * i)) & 0xff).toInt)
      rows.write(0); rows.write(0)
    }
    val xrefData = new String(deflate(rows.toByteArray), iso)
    val catalogNum = nPages + 3
    sb.append(s"$xrefNum 0 obj\n<< /Type /XRef /Size ${size + 2} " +
      s"/W [ 1 4 2 ] /Index [ $index ] /Root $catalogNum 0 R " +
      s"/Prev $prevXref /Filter /FlateDecode " +
      s"/Length ${xrefData.length} >>\nstream\n$xrefData\nendstream\nendobj\n")
    sb.append(s"startxref\n$xrefAt\n%%EOF\n")
    base ++ sb.toString.getBytes(iso)
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
      // font dicts (and their resource bindings) may live inside object
      // streams — resolve decoders over the expanded document
      val fonts = fontDecoders(expandObjectStreams(b, s))
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
          // metadata streams are not page content: ToUnicode CMaps,
          // packed object streams, xref streams
          val isCmap = dict.contains("/CMapType") ||
            dict.contains("/ObjStm") || dict.contains("/XRef")
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
          // ToUnicode CMap streams are font metadata, not page content
          if (!isCmap) out += ((streamText(content, fonts), isFlate))
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

  /** Encode one word's bytes as a TJ array element, rotating through
    * the three real-world spellings: literal string, hex string, and
    * literal-with-octal-first-char. */
  private def tjElement(word: String, kind: Int, enc: Char => Int): String = {
    val codes = word.map(enc)
    kind % 3 match {
      case 0 => "(" + codes.map(c => escape(c.toChar.toString)).mkString + ")"
      case 1 => "<" + codes.map(c => f"$c%02X").mkString + ">"
      case _ =>
        val head = f"\\${codes.head}%03o"
        "(" + head + codes.tail.map(c => escape(c.toChar.toString)).mkString + ")"
    }
  }

  /** TJ-array fixture writer: one WinAnsiEncoding font, each page's
    * text emitted as `[ elem -250 elem … ] TJ` — words alternate
    * literal / hex / octal-headed spellings, inter-word kerning -250
    * (re-emitted as the space by the extractor), and the first word is
    * additionally split in two with a -20 kern that must NOT produce a
    * space. Characters in WinAnsi's 0x80–0x9F remap region (€ ™ …)
    * are encoded through the inverse table. `flate` zlib-compresses
    * the content streams. */
  def writePdfTjText(version: String, texts: Seq[String],
      flate: Boolean = false): Array[Byte] = {
    val nPages = texts.length
    require(nPages >= 1 && nPages <= 999, s"bad page count $nPages")
    val enc: Char => Int = c =>
      WinAnsiInverse.getOrElse(c, { require(c.toInt <= 255, s"not WinAnsi: $c"); c.toInt })
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
      val words = t.split(" ", -1)
      val elems = scala.collection.mutable.ArrayBuffer[String]()
      words.zipWithIndex.foreach { case (w, wi) =>
        if (wi > 0) elems += "-250"
        if (wi == 0 && w.length >= 2) {
          val cut = w.length / 2
          elems += tjElement(w.substring(0, cut), 0, enc)
          elems += "-20"
          elems += tjElement(w.substring(cut), 1, enc)
        } else if (w.nonEmpty) elems += tjElement(w, wi, enc)
      }
      val ops = s"BT /F1 12 Tf 72 720 Td [ ${elems.mkString(" ")} ] TJ ET"
      val stream =
        if (flate) new String(
          deflate(ops.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)),
          java.nio.charset.StandardCharsets.ISO_8859_1)
        else ops
      val filter = if (flate) " /Filter /FlateDecode" else ""
      obj(s"<< /Length ${stream.length}$filter >>\nstream\n$stream\nendstream")
    }
    obj("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding /WinAnsiEncoding >>")
    val xrefAt = sb.length
    sb.append(s"xref\n0 ${offsets.length + 1}\n")
    sb.append("0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\n")
    sb.append(s"startxref\n$xrefAt\n%%EOF\n")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** ToUnicode-CMap fixture writer: a single font whose codes are
    * assigned per distinct character of the given texts (codes from
    * 0x21), with every occurrence of "fi" collapsed to ONE code whose
    * bfchar target is the two-codepoint sequence — the ligature case
    * real subset fonts produce. Pages show hex strings `<…> Tj`;
    * extraction must resolve codes through the CMap. */
  /** Fixture CMap over the distinct tokens of `texts` ("fi" collapses
    * to ONE code whose bfchar target is the two-codepoint sequence —
    * the ligature case real subset fonts produce): returns the CMap
    * text and each page's hex string. */
  private def cmapFixture(texts: Seq[String]): (String, Seq[String]) = {
    def tokens(t: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < t.length) {
        if (i + 1 < t.length && t.charAt(i) == 'f' && t.charAt(i + 1) == 'i') {
          out += "fi"; i += 2
        } else { out += t.charAt(i).toString; i += 1 }
      }
      out.toSeq
    }
    val toks = texts.map(tokens)
    val alphabet = toks.flatten.distinct
    require(alphabet.size <= 200, "fixture alphabet too large")
    val code: Map[String, Int] = alphabet.zipWithIndex.map {
      case (t, k) => t -> (0x21 + k)
    }.toMap
    val bfchars = alphabet.map { t =>
      val dst = t.map(c => f"${c.toInt}%04X").mkString
      f"<${code(t)}%02X> <$dst>"
    }.mkString("\n")
    val cmap =
      s"""/CIDInit /ProcSet findresource begin
         |begincmap
         |1 begincodespacerange
         |<00> <FF>
         |endcodespacerange
         |${alphabet.size} beginbfchar
         |$bfchars
         |endbfchar
         |endcmap
         |""".stripMargin
    (cmap, toks.map(tk => tk.map(t => f"${code(t)}%02X").mkString))
  }

  def writePdfCmapText(version: String, texts: Seq[String]): Array[Byte] = {
    val nPages = texts.length
    require(nPages >= 1 && nPages <= 999, s"bad page count $nPages")
    val (cmap, hexes) = cmapFixture(texts)
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
    val cmapObj = fontObj + 1
    for (k <- 0 until nPages)
      obj(s"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
        s"/Contents ${3 + nPages + k} 0 R " +
        s"/Resources << /Font << /F2 $fontObj 0 R >> >> >>")
    for (hex <- hexes) {
      val ops = s"BT /F2 12 Tf 72 720 Td <$hex> Tj ET"
      obj(s"<< /Length ${ops.length} >>\nstream\n$ops\nendstream")
    }
    obj(s"<< /Type /Font /Subtype /Type1 /BaseFont /Fixture " +
      s"/ToUnicode $cmapObj 0 R >>")
    obj(s"<< /CMapType 2 /Length ${cmap.length} >>\nstream\n$cmap\nendstream")
    val xrefAt = sb.length
    sb.append(s"xref\n0 ${offsets.length + 1}\n")
    sb.append("0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\n")
    sb.append(s"startxref\n$xrefAt\n%%EOF\n")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** PDF 1.5+ fixture writer: catalog, pages root, page dicts, and the
    * FONT dict (with its `/ToUnicode N 0 R`) live ONLY inside a
    * flate-compressed `/Type /ObjStm`; the cross-reference is an xref
    * STREAM (`/W [ 1 4 2 ]`, type-1 rows for top-level objects, type-2
    * rows pointing into the object stream), no classic table or
    * trailer anywhere — the layout most post-2005 PDFs actually use.
    * Page content shows CMap-coded hex strings, so extraction must
    * resolve the font THROUGH the object stream to decode at all. */
  def writePdfObjStm(version: String, texts: Seq[String]): Array[Byte] = {
    val nPages = texts.length
    require(nPages >= 1 && nPages <= 999, s"bad page count $nPages")
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val (cmap, hexes) = cmapFixture(texts)
    val cmapNum = nPages + 1
    val objStmNum = nPages + 2
    val catalogNum = nPages + 3
    val pagesNum = nPages + 4
    val fontNum = 2 * nPages + 5
    val xrefNum = 2 * nPages + 6
    val packed: Seq[(Int, String)] =
      Seq(catalogNum -> s"<< /Type /Catalog /Pages $pagesNum 0 R >>",
          pagesNum -> (s"<< /Type /Pages /Kids [ " +
            (0 until nPages).map(k => s"${nPages + 5 + k} 0 R").mkString(" ") +
            s" ] /Count $nPages >>")) ++
      (0 until nPages).map(k => (nPages + 5 + k) ->
        (s"<< /Type /Page /Parent $pagesNum 0 R /MediaBox [ 0 0 612 792 ] " +
         s"/Contents ${k + 1} 0 R " +
         s"/Resources << /Font << /F2 $fontNum 0 R >> >> >>")) :+
      (fontNum -> (s"<< /Type /Font /Subtype /Type1 /BaseFont /Fixture " +
        s"/ToUnicode $cmapNum 0 R >>"))
    val bodyBuf = new StringBuilder
    val memberOffs = scala.collection.mutable.ArrayBuffer[Int]()
    packed.foreach { case (_, body) =>
      memberOffs += bodyBuf.length
      bodyBuf.append(body).append('\n')
    }
    val header = packed.zip(memberOffs)
      .map { case ((num, _), o) => s"$num $o" }.mkString(" ") + "\n"
    val objStmStr =
      new String(deflate((header + bodyBuf).getBytes(iso)), iso)
    val sb = new StringBuilder
    val offsets = scala.collection.mutable.Map[Int, Int]()
    def obj(num: Int, body: String): Unit = {
      offsets(num) = sb.length
      sb.append(s"$num 0 obj\n$body\nendobj\n")
    }
    sb.append(s"%PDF-$version\n")
    for ((hex, k) <- hexes.zipWithIndex) {
      val ops = s"BT /F2 12 Tf 72 720 Td <$hex> Tj ET"
      obj(k + 1, s"<< /Length ${ops.length} >>\nstream\n$ops\nendstream")
    }
    obj(cmapNum,
      s"<< /CMapType 2 /Length ${cmap.length} >>\nstream\n$cmap\nendstream")
    obj(objStmNum,
      s"<< /Type /ObjStm /N ${packed.length} /First ${header.length} " +
      s"/Filter /FlateDecode /Length ${objStmStr.length} >>\n" +
      s"stream\n$objStmStr\nendstream")
    val xrefAt = sb.length
    val size = 2 * nPages + 7
    val rows = new java.io.ByteArrayOutputStream()
    def row(t: Int, f2: Long, f3: Int): Unit = {
      rows.write(t)
      for (i <- 3 to 0 by -1) rows.write(((f2 >> (8 * i)) & 0xff).toInt)
      rows.write((f3 >> 8) & 0xff)
      rows.write(f3 & 0xff)
    }
    row(0, 0, 0xffff)
    for (num <- 1 to nPages + 2) row(1, offsets(num).toLong, 0)
    packed.indices.foreach(idx => row(2, objStmNum.toLong, idx))
    row(1, xrefAt.toLong, 0)
    val xrefData = new String(deflate(rows.toByteArray), iso)
    sb.append(s"$xrefNum 0 obj\n<< /Type /XRef /Size $size /W [ 1 4 2 ] " +
      s"/Root $catalogNum 0 R /Filter /FlateDecode " +
      s"/Length ${xrefData.length} >>\nstream\n$xrefData\nendstream\nendobj\n")
    sb.append(s"startxref\n$xrefAt\n%%EOF\n")
    sb.toString.getBytes(iso)
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

  // ---------------------------------- standard security handler (RC4)
  //
  // Encrypted-PDF support for the empty-user-password majority: the
  // standard security handler, V1/V2 (RC4) at R2/R3 (ISO 32000-1
  // §7.6.3 algorithms 2-7, all formula/procedure, implementable and
  // self-gated by an in-repo encrypter + U-entry authentication). RC4
  // is length-preserving, so decryption happens IN PLACE on a copy of
  // the document bytes — every xref offset and /Length stays valid and
  // the whole existing extraction stack (TJ/CMap/ObjStm/incremental)
  // runs on the decrypted bytes unchanged. Scope stated honestly:
  // streams are decrypted (that is where extractable text lives);
  // V4/V5 AES and non-empty user passwords return None (the census
  // still reports them); in-dict literal strings are left encrypted
  // (no fixture writes them — a TODO the census quantifies, not a
  // silent wrong answer).

  /** The spec's 32-byte password pad (ISO 32000-1 Table 7.6.3.3-1). */
  private val PdfPad: Array[Byte] = Array(
    0x28, 0xbf, 0x4e, 0x5e, 0x4e, 0x75, 0x8a, 0x41,
    0x64, 0x00, 0x4e, 0x56, 0xff, 0xfa, 0x01, 0x08,
    0x2e, 0x2e, 0x00, 0xb6, 0xd0, 0x68, 0x3e, 0x80,
    0x2f, 0x0c, 0xa9, 0xfe, 0x64, 0x53, 0x69, 0x7a).map(_.toByte)

  /** Plain RC4 (the spec's symmetric cipher for V1/V2). */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val st = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + st(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = st(i); st(i) = st(j); st(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0
    var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xff
      y = (y + st(x)) & 0xff
      val t = st(x); st(x) = st(y); st(y) = t
      out(k) = (data(k) ^ st((st(x) + st(y)) & 0xff)).toByte
      k += 1
    }
    out
  }

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private def pad32(pwd: Array[Byte]): Array[Byte] =
    (pwd.take(32) ++ PdfPad).take(32)

  private def leInt(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  // -------------------------------------------------- AES primitives

  private def aesCbc(encrypt: Boolean, key: Array[Byte], iv: Array[Byte],
                     data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(
      if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE
      else javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  private def aesEcbEncrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"))
    c.doFinal(data)
  }

  private def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance(alg)
    parts.foreach(d.update)
    d.digest()
  }

  private def pkcs5Pad(data: Array[Byte]): Array[Byte] = {
    val n = 16 - data.length % 16
    data ++ Array.fill(n)(n.toByte)
  }

  private def pkcs5Strip(data: Array[Byte]): Option[Array[Byte]] = {
    if (data.isEmpty || data.length % 16 != 0) return None
    val n = data.last & 0xff
    if (n < 1 || n > 16 || n > data.length) return None
    Some(data.dropRight(n))
  }

  /** AESV2 per-object key (ISO 32000-1 Algorithm 1): MD5 of the file
    * key, the object/generation numbers, and the constant "sAlT". */
  private def objectKeyAes(fileKey: Array[Byte], num: Int, gen: Int)
      : Array[Byte] =
    md5(fileKey, Array(
      (num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
      ((num >> 16) & 0xff).toByte,
      (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte),
      Array(0x73.toByte, 0x41.toByte, 0x6c.toByte, 0x54.toByte))
      .take(math.min(fileKey.length + 5, 16))

  /** ISO 32000-2 Algorithm 2.B — the R6 hardened hash. The digest
    * choice takes the first 16 bytes of E as a big-endian integer mod
    * 3, and 256 ≡ 1 (mod 3), so the byte SUM mod 3 is exact. */
  private[functions] def hashR6(pwd: Array[Byte], salt: Array[Byte],
                                udata: Array[Byte]): Array[Byte] = {
    var k = sha("SHA-256", pwd, salt, udata)
    var e: Array[Byte] = Array.emptyByteArray
    var i = 0
    while (i < 64 || (e.last & 0xff) > i - 32) {
      val block = pwd ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var j = 0
      while (j < 64) {
        System.arraycopy(block, 0, k1, j * block.length, block.length)
        j += 1
      }
      e = aesCbc(encrypt = true, k.take(16), k.slice(16, 32), k1)
      val mod = e.take(16).map(_ & 0xff).sum % 3
      k = sha(Seq("SHA-256", "SHA-384", "SHA-512")(mod), e)
      i += 1
    }
    k.take(32)
  }

  /** Algorithm 2: the file encryption key from a (user) password. */
  private[functions] def stdFileKey(r: Int, lenBytes: Int, o: Array[Byte],
                                    p: Int, id0: Array[Byte],
                                    userPwd: Array[Byte]): Array[Byte] = {
    var h = md5(pad32(userPwd), o, leInt(p), id0)
    if (r >= 3) {
      var i = 0
      while (i < 50) { h = md5(h.take(lenBytes)); i += 1 }
    }
    h.take(lenBytes)
  }

  /** Algorithm 3: the /O entry from owner + user passwords. */
  private[functions] def stdOEntry(r: Int, lenBytes: Int,
                                   ownerPwd: Array[Byte],
                                   userPwd: Array[Byte]): Array[Byte] = {
    var h = md5(pad32(ownerPwd))
    if (r >= 3) {
      var i = 0
      while (i < 50) { h = md5(h); i += 1 }
    }
    val key = h.take(lenBytes)
    var o = rc4(key, pad32(userPwd))
    if (r >= 3) {
      var i = 1
      while (i <= 19) {
        o = rc4(key.map(b => (b ^ i).toByte), o)
        i += 1
      }
    }
    o
  }

  /** Algorithms 4/5: the /U entry from the file key. */
  private[functions] def stdUEntry(r: Int, fileKey: Array[Byte],
                                   id0: Array[Byte]): Array[Byte] =
    if (r == 2) rc4(fileKey, PdfPad)
    else {
      var u = rc4(fileKey, md5(PdfPad, id0))
      var i = 1
      while (i <= 19) {
        u = rc4(fileKey.map(b => (b ^ i).toByte), u)
        i += 1
      }
      u ++ new Array[Byte](16)
    }

  /** Per-object key (§7.6.2): md5(fileKey + obj(3 LE) + gen(2 LE)),
    * first min(len+5, 16) bytes. */
  private def objectKey(fileKey: Array[Byte], num: Int, gen: Int): Array[Byte] =
    md5(fileKey, Array(
      (num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
      ((num >> 16) & 0xff).toByte,
      (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte))
      .take(math.min(fileKey.length + 5, 16))

  final case class PdfEncryptMeta(v: Int, r: Int, lengthBits: Int,
                                  standard: Boolean, emptyUserPwd: Boolean)

  private def hexBytes(s: String): Array[Byte] =
    s.filterNot(_.isWhitespace).grouped(2)
      .map(h => Integer.parseInt(h, 16).toByte).toArray

  private final case class EncDict(v: Int, r: Int, lenBytes: Int, p: Int,
                                   o: Array[Byte], u: Array[Byte],
                                   ue: Option[Array[Byte]],
                                   oe: Option[Array[Byte]],
                                   id0: Array[Byte], cfm: String)

  /** Locate and parse the /Encrypt dictionary + the first /ID string. */
  private def encryptDict(s: String): Option[EncDict] = {
    val trailerAt = s.lastIndexOf("trailer")
    val scope = if (trailerAt >= 0) s.substring(trailerAt) else s
    val em = java.util.regex.Pattern
      .compile("/Encrypt\\s+(\\d+)\\s+\\d+\\s+R").matcher(scope)
    if (!em.find()) return None
    val encNum = em.group(1).toInt
    val im = java.util.regex.Pattern
      .compile("/ID\\s*\\[\\s*<([0-9A-Fa-f]+)>").matcher(s)
    val id0 = if (im.find()) hexBytes(im.group(1)) else Array.emptyByteArray
    // (?<!\d) anchors the object number's left edge so "/Encrypt 12 0 R"
    // cannot match inside an unrelated "112 0 obj" header
    val om = java.util.regex.Pattern
      .compile(s"(?s)(?<!\\d)$encNum\\s+\\d+\\s+obj(.*?)endobj").matcher(s)
    if (!om.find()) return None
    val dict = om.group(1)
    if (!dict.contains("/Standard")) return None
    def num(key: String, dflt: Int): Int = {
      val m = java.util.regex.Pattern
        .compile(key + "\\s+(-?\\d+)").matcher(dict)
      if (m.find()) m.group(1).toInt else dflt
    }
    def hexStr(key: String): Option[Array[Byte]] = {
      val m = java.util.regex.Pattern
        .compile(key + "\\s*<([0-9A-Fa-f]+)>").matcher(dict)
      if (m.find()) Some(hexBytes(m.group(1))) else None
    }
    val v = num("/V", 0)
    val r = num("/R", 2)
    val lenBits = num("/Length", if (v >= 5) 256 else 40)
    val p = num("/P", -1)
    // stream crypt filter method: V4/V5 declare it in /CF /StdCF /CFM
    val cfm = {
      val m = java.util.regex.Pattern
        .compile("/CFM\\s*/(\\w+)").matcher(dict)
      if (m.find()) m.group(1)
      else if (v <= 2) "V2" // RC4 implied pre-/CF
      else ""
    }
    for (o <- hexStr("/O"); u <- hexStr("/U"))
      yield EncDict(v, r, lenBits / 8, p, o, u, hexStr("/UE"),
        hexStr("/OE"), id0, cfm)
  }

  /** Empty-user-password authentication + file-key recovery across the
    * standard handler generations: RC4 R2/R3, AESV2 (V4/R4), AESV3
    * (V5/R6). None = not authenticated or out-of-scope handler. */
  private def authEmptyUser(d: EncDict): Option[Array[Byte]] =
    authPassword(d, Array.emptyByteArray)

  /** Algorithm-6 user check for the RC4/AESV2 generations: derive the
    * file key from a (padded-on-entry) user password and compare the
    * recomputed /U. `r` here is the KEY-DERIVATION revision (V4/AESV2
    * uses the R3 math under its own R4 label). */
  private def authUserRc4(r: Int, d: EncDict, pwd: Array[Byte])
      : Option[Array[Byte]] = {
    val key = stdFileKey(r, d.lenBytes, d.o, d.p, d.id0, pwd)
    val u2 = stdUEntry(r, key, d.id0)
    val ok =
      if (r == 2) java.util.Arrays.equals(u2, d.u)
      else d.u.length >= 16 &&
        java.util.Arrays.equals(u2.take(16), d.u.take(16))
    if (ok) Some(key) else None
  }

  /** Algorithm 7 owner check for RC4/AESV2: the owner key un-RC4s /O
    * back to the PADDED user password, which then authenticates via
    * Algorithm 6 (pad32 is idempotent on a 32-byte input). */
  private def authOwnerRc4(r: Int, d: EncDict, pwd: Array[Byte])
      : Option[Array[Byte]] = {
    if (d.o.length != 32) return None
    var h = md5(pad32(pwd))
    if (r >= 3) {
      var i = 0
      while (i < 50) { h = md5(h); i += 1 }
    }
    val okey = h.take(d.lenBytes)
    var userPad = d.o
    if (r >= 3) {
      var i = 19
      while (i >= 1) {
        userPad = rc4(okey.map(b => (b ^ i).toByte), userPad)
        i -= 1
      }
    }
    userPad = rc4(okey, userPad)
    authUserRc4(r, d, userPad)
  }

  /** Supplied-password authentication + file-key recovery — ISO
    * 32000-1 Algorithms 6/7 (RC4, AESV2) and ISO 32000-2 Algorithm
    * 2.A (AESV3): the USER branch first, then the OWNER branch, so a
    * caller's password list may mix both kinds. V5 passwords are
    * UTF-8, truncated to 127 bytes per 2.A (SASLprep normalization out
    * of scope — ASCII passwords, the fixture surface, are unaffected).
    * None = not authenticated or out-of-scope handler. */
  private def authPassword(d: EncDict, pwd: Array[Byte])
      : Option[Array[Byte]] = d.v match {
    case 1 | 2 if d.r == 2 || d.r == 3 =>
      authUserRc4(d.r, d, pwd) orElse authOwnerRc4(d.r, d, pwd)
    case 4 if d.r == 4 && d.cfm == "AESV2" =>
      authUserRc4(3, d, pwd) orElse authOwnerRc4(3, d, pwd)
    case 5 if d.r == 6 && d.cfm == "AESV3" && d.u.length >= 48 =>
      val p = pwd.take(127)
      val user = {
        val vs = d.u.slice(32, 40)
        val ks = d.u.slice(40, 48)
        if (!java.util.Arrays.equals(hashR6(p, vs, Array.emptyByteArray),
          d.u.take(32))) None
        else d.ue.filter(_.length == 32).map { ue =>
          aesCbc(encrypt = false, hashR6(p, ks, Array.emptyByteArray),
            new Array[Byte](16), ue)
        }
      }
      user orElse {
        // owner branch: salts live in /O, the full 48-byte /U is the
        // extra hash input, the key unwraps /OE
        if (d.o.length < 48) None
        else {
          val u48 = d.u.take(48)
          val ovs = d.o.slice(32, 40)
          val oks = d.o.slice(40, 48)
          if (!java.util.Arrays.equals(hashR6(p, ovs, u48), d.o.take(32)))
            None
          else d.oe.filter(_.length == 32).map { oe =>
            aesCbc(encrypt = false, hashR6(p, oks, u48),
              new Array[Byte](16), oe)
          }
        }
      }
    case _ => None
  }

  /** ENCRYPTION CENSUS: handler kind, V/R, key length, and whether the
    * empty user password authenticates (algorithm 6) — the governance
    * split between "decryptable majority" and "actually locked". None
    * when the document declares no /Encrypt. */
  def encryptMeta(b: Array[Byte]): Option[PdfEncryptMeta] =
    try {
      val s = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
      encryptDict(s).map { d =>
        PdfEncryptMeta(d.v, d.r, d.lenBytes * 8, standard = true,
          authEmptyUser(d).isDefined)
      }
    } catch {
      case scala.util.control.NonFatal(_) => None
    }

  /** Decrypt a standard-security-handler document with an EMPTY user
    * password — RC4 (V1/V2), AESV2 (V4/AES-128-CBC, per-object keys)
    * or AESV3 (V5/R6, AES-256): every stream is decrypted in place.
    * RC4 preserves length; AES plaintext is shorter (IV + padding), so
    * the freed tail is space-filled — whitespace is inert in content
    * streams and past-the-end for Flate/ObjStm payloads, so every
    * offset stays valid. None when not encrypted, not a supported
    * handler, or the empty password does not authenticate. */
  def decryptPdf(b: Array[Byte]): Option[Array[Byte]] = decryptPdf(b, Nil)

  /** [[decryptPdf]] with a caller-supplied password list: the empty
    * password is tried first (the decryptable-majority fast path),
    * then each candidate through BOTH the user and owner branches
    * (Algorithms 6/7; ISO 32000-2 Algorithm 2.A for AESV3). Password
    * bytes are Latin-1 for the legacy handlers, UTF-8 (≤127 bytes)
    * for V5, per spec. None = no candidate authenticates. */
  def decryptPdf(b: Array[Byte], passwords: Seq[String])
      : Option[Array[Byte]] =
    try {
      val s = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
      val d = encryptDict(s).getOrElse(return None)
      val pwdCharset =
        if (d.v >= 5) java.nio.charset.StandardCharsets.UTF_8
        else java.nio.charset.StandardCharsets.ISO_8859_1
      val key = (Array.emptyByteArray +:
        passwords.map(_.getBytes(pwdCharset)))
        .view.flatMap(authPassword(d, _)).headOption
        .getOrElse(return None)
      val aes = d.v >= 4
      val out = b.clone()
      val objRe = java.util.regex.Pattern
        .compile("(?s)(\\d+)\\s+(\\d+)\\s+obj(.*?)endobj").matcher(s)
      while (objRe.find()) {
        val num = objRe.group(1).toInt
        val gen = objRe.group(2).toInt
        val body = objRe.group(3)
        val si = body.indexOf("stream")
        // ISO 32000-1 §7.5.8.2: cross-reference streams are NEVER
        // encrypted — RC4-ing one would corrupt the xref table that
        // locates every other object
        val isXref = si >= 0 &&
          XrefTypeRe.matcher(body.substring(0, si)).find()
        if (si >= 0 && !isXref) {
          var ds = objRe.start(3) + si + 6
          if (ds < s.length && s.charAt(ds) == '\r') ds += 1
          if (ds >= s.length || s.charAt(ds) != '\n') return None
          ds += 1
          val lm = LengthRe.matcher(body.substring(0, si))
          val end = (if (lm.find()) lm.group(1).toLongOption else None) match {
            case Some(len) if len >= 0 && ds.toLong + len <= b.length =>
              ds + len.toInt
            case _ =>
              val e = s.indexOf("endstream", ds)
              if (e < 0) return None else e
          }
          val ct = java.util.Arrays.copyOfRange(b, ds, end)
          if (!aes) {
            val dec = rc4(objectKey(key, num, gen), ct)
            System.arraycopy(dec, 0, out, ds, dec.length)
          } else {
            // AES: 16-byte IV prefix, CBC body, PKCS#5 padding; the
            // plaintext is shorter, so space-fill the freed tail
            if (ct.length < 32 || ct.length % 16 != 0) return None
            val objKey =
              if (d.v == 5) key else objectKeyAes(key, num, gen)
            val dec = pkcs5Strip(aesCbc(encrypt = false, objKey,
              ct.take(16), ct.drop(16))).getOrElse(return None)
            System.arraycopy(dec, 0, out, ds, dec.length)
            java.util.Arrays.fill(out, ds + dec.length, end, ' '.toByte)
          }
        }
      }
      Some(out)
    } catch {
      case scala.util.control.NonFatal(_) => None
    }

  /** Extraction through encryption: decrypt (empty user password),
    * then the normal [[extractText]]. */
  def extractTextEncrypted(b: Array[Byte]): Option[Seq[String]] =
    decryptPdf(b).flatMap(extractText)

  /** Extraction through encryption with a supplied password list. */
  def extractTextEncrypted(b: Array[Byte], passwords: Seq[String])
      : Option[Seq[String]] =
    decryptPdf(b, passwords).flatMap(extractText)

  /** Fixture writer: the [[writePdfWithText]] layout with REAL RC4
    * standard-handler encryption — content streams encrypted with
    * per-object keys, /O from the owner password, /U authenticating
    * `userPwd` (default empty — the decryptable majority), /ID
    * present. `r` 2 (40-bit) or 3
    * (variable length, default 128-bit). */
  def writePdfEncryptedText(version: String, texts: Seq[String],
                            ownerPwd: String, r: Int = 3,
                            lenBits: Int = 128,
                            flate: Boolean = false,
                            userPwd: String = ""): Array[Byte] = {
    val nPages = texts.length
    require(nPages >= 1 && nPages <= 999, s"bad page count $nPages")
    require(r == 2 || r == 3, "R2 or R3")
    require(if (r == 2) lenBits == 40 else lenBits % 8 == 0 &&
      lenBits >= 40 && lenBits <= 128, "bad length")
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val lenBytes = lenBits / 8
    val pFlags = -44
    val id0 = md5(texts.mkString("|").getBytes(iso)).take(16)
    val oEntry = stdOEntry(r, lenBytes, ownerPwd.getBytes(iso),
      userPwd.getBytes(iso))
    val fileKey = stdFileKey(r, lenBytes, oEntry, pFlags, id0,
      userPwd.getBytes(iso))
    val uEntry = stdUEntry(r, fileKey, id0)
    def hex(a: Array[Byte]): String = a.map("%02X".format(_)).mkString
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
    for ((t, k) <- texts.zipWithIndex) {
      val ops = s"BT /F1 12 Tf 72 720 Td (${escape(t)}) Tj ET"
      val plain =
        if (flate) deflate(ops.getBytes(iso)) else ops.getBytes(iso)
      val objNum = 3 + nPages + k
      val enc = rc4(objectKey(fileKey, objNum, 0), plain)
      val filter = if (flate) " /Filter /FlateDecode" else ""
      obj(s"<< /Length ${enc.length}$filter >>\nstream\n" +
        new String(enc, iso) + "\nendstream")
    }
    obj("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    obj(s"<< /Filter /Standard /V ${if (r == 2) 1 else 2} /R $r " +
      (if (r == 3) s"/Length $lenBits " else "") +
      s"/P $pFlags /O <${hex(oEntry)}> /U <${hex(uEntry)}> >>")
    val xrefAt = sb.length
    sb.append(s"xref\n0 ${offsets.length + 1}\n")
    sb.append("0000000000 65535 f \n")
    offsets.foreach(of => sb.append(f"$of%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R " +
      s"/Encrypt ${offsets.length} 0 R " +
      s"/ID [ <${hex(id0)}> <${hex(id0)}> ] >>\n")
    sb.append(s"startxref\n$xrefAt\n%%EOF\n")
    sb.toString.getBytes(iso)
  }

  /** Fixture writer: AES standard-handler encryption. `v5 = false` →
    * AESV2 (V4/R4, AES-128-CBC, per-object keys via the "sAlT" MD5);
    * `v5 = true` → AESV3 (V5/R6, AES-256, SHA-2 hardened hash,
    * U/UE/O/OE/Perms per ISO 32000-2). `userPwd` (default empty — the
    * decryptable majority) authenticates /U and wraps /UE; `ownerPwd`
    * seeds /O (and /OE). Streams carry a
    * per-object deterministic IV + PKCS#5-padded CBC ciphertext. */
  def writePdfEncryptedAes(version: String, texts: Seq[String],
                           ownerPwd: String, v5: Boolean,
                           flate: Boolean = false,
                           userPwd: String = ""): Array[Byte] = {
    val nPages = texts.length
    require(nPages >= 1 && nPages <= 999, s"bad page count $nPages")
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val pFlags = -44
    val id0 = md5(texts.mkString("|").getBytes(iso)).take(16)
    def hex(a: Array[Byte]): String = a.map("%02X".format(_)).mkString
    // --- handler material
    val none = Array.emptyByteArray
    var encryptDictBody = ""
    var fileKey: Array[Byte] = null
    if (!v5) {
      val oEntry = stdOEntry(3, 16, ownerPwd.getBytes(iso),
        userPwd.getBytes(iso))
      fileKey = stdFileKey(3, 16, oEntry, pFlags, id0,
        userPwd.getBytes(iso))
      val uEntry = stdUEntry(3, fileKey, id0)
      encryptDictBody = "<< /Filter /Standard /V 4 /R 4 /Length 128 " +
        "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> " +
        "/StmF /StdCF /StrF /StdCF " +
        s"/P $pFlags /O <${hex(oEntry)}> /U <${hex(uEntry)}> >>"
    } else {
      fileKey = sha("SHA-256", "graft-aesv3-key".getBytes(iso),
        texts.mkString("|").getBytes(iso))
      val up = userPwd
        .getBytes(java.nio.charset.StandardCharsets.UTF_8).take(127)
      val vs = md5(Array('v'.toByte), id0).take(8)
      val ks = md5(Array('k'.toByte), id0).take(8)
      val u48 = hashR6(up, vs, none) ++ vs ++ ks
      val ue = aesCbc(encrypt = true, hashR6(up, ks, none),
        new Array[Byte](16), fileKey)
      val op = ownerPwd.getBytes(iso)
      val ovs = md5(Array('V'.toByte), id0).take(8)
      val oks = md5(Array('K'.toByte), id0).take(8)
      val o48 = hashR6(op, ovs, u48) ++ ovs ++ oks
      val oe = aesCbc(encrypt = true, hashR6(op, oks, u48),
        new Array[Byte](16), fileKey)
      val permsPlain = leInt(pFlags) ++
        Array(0xff, 0xff, 0xff, 0xff).map(_.toByte) ++
        "Tadb".getBytes(iso) ++ md5(id0).take(4)
      val perms = aesEcbEncrypt(fileKey, permsPlain)
      encryptDictBody = "<< /Filter /Standard /V 5 /R 6 /Length 256 " +
        "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> " +
        "/StmF /StdCF /StrF /StdCF " +
        s"/P $pFlags /O <${hex(o48)}> /U <${hex(u48)}> " +
        s"/OE <${hex(oe)}> /UE <${hex(ue)}> /Perms <${hex(perms)}> >>"
    }
    // --- document body (the writePdfWithText layout)
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
    for ((t, k) <- texts.zipWithIndex) {
      val ops = s"BT /F1 12 Tf 72 720 Td (${escape(t)}) Tj ET"
      val plain =
        if (flate) deflate(ops.getBytes(iso)) else ops.getBytes(iso)
      val objNum = 3 + nPages + k
      val objKey = if (v5) fileKey else objectKeyAes(fileKey, objNum, 0)
      val iv = md5(leInt(objNum), id0) // deterministic per object
      val enc = iv ++ aesCbc(encrypt = true, objKey, iv, pkcs5Pad(plain))
      val filter = if (flate) " /Filter /FlateDecode" else ""
      obj(s"<< /Length ${enc.length}$filter >>\nstream\n" +
        new String(enc, iso) + "\nendstream")
    }
    obj("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    obj(encryptDictBody)
    val xrefAt = sb.length
    sb.append(s"xref\n0 ${offsets.length + 1}\n")
    sb.append("0000000000 65535 f \n")
    offsets.foreach(of => sb.append(f"$of%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R " +
      s"/Encrypt ${offsets.length} 0 R " +
      s"/ID [ <${hex(id0)}> <${hex(id0)}> ] >>\n")
    sb.append(s"startxref\n$xrefAt\n%%EOF\n")
    sb.toString.getBytes(iso)
  }
}
