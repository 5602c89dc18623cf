package graft

import graft.functions.Mp3Codec
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 operator laws, starting with the MP3 duration census:
  * Xing/Info frame counts, the CBR size estimate, channel-mode
  * parsing, and the hostile-input never-throw law. */
class Round11OpsSpec extends AnyFunSuite {

  test("Xing frame count drives duration; Info marks CBR") {
    val xing = Mp3Codec.writeMp3Xing(1, mono = false, frames = 480)
    val m = Mp3Codec.meta(xing).get
    assert(m.sampleRate == 48000 && m.channels == 2)
    assert(m.frames == 480 && m.vbr)
    assert(m.durationMs == 480L * 1152 * 1000 / 48000) // 11520 ms
    val info = Mp3Codec.writeMp3Xing(0, mono = true, frames = 77, info = true)
    val mi = Mp3Codec.meta(info).get
    assert(mi.channels == 1 && mi.frames == 77 && !mi.vbr)
    assert(mi.durationMs == 77L * 1152 * 1000 / 44100)
  }

  test("CBR estimate recovers the exact written frame count") {
    for (br <- 1 to 14; sr <- 0 to 2; mono <- Seq(true, false)) {
      val b = Mp3Codec.writeMp3Cbr(br, sr, mono, nFrames = 9)
      val m = Mp3Codec.meta(b).get
      assert(m.frames == 9, s"br=$br sr=$sr mono=$mono")
      assert(!m.vbr)
      assert(m.channels == (if (mono) 1 else 2))
      assert(m.durationMs == 9L * 1152 * 1000 / m.sampleRate)
    }
  }

  test("CBR estimate floors partial trailing frames; ID3 span excluded") {
    val b = Mp3Codec.writeMp3Cbr(9, 0, mono = false, nFrames = 3)
    val truncated = b.take(b.length - 1) // last frame now partial
    assert(Mp3Codec.meta(truncated).get.frames == 2)
    // an ID3 tag in front must not count toward the audio byte span
    val tagged = Mp3Codec.writeId3(Seq(Mp3Codec.Id3Frame("TIT2", "t")),
      padding = 5000) ++ b
    val m = Mp3Codec.meta(tagged).get
    assert(m.frames == 3 && m.id3Size > 5000)
  }

  // ------------------------------------------------------------- EPUB

  test("EPUB chain resolution: spine order, reversed manifest, subdirs") {
    import graft.ops.Archives
    val chapters = Seq(("One", "first body"), ("Two", "second body"),
      ("Thr<ee&", "third <b>ody&"))
    val epub = Archives.writeEpub(chapters)
    val got = Archives.epubChapters(epub).get
    assert(got.map(_._1) == Seq(0, 1, 2))
    assert(got.map(_._2) == Seq("OEBPS/text/ch0.xhtml",
      "OEBPS/text/ch1.xhtml", "OEBPS/text/ch2.xhtml"))
    // spine order holds even though the manifest lists items reversed
    assert(got(0)._3.contains("first body"))
    assert(got(2)._3.contains("third &lt;b&gt;ody&amp;"))
  }

  test("EPUB hostile containers reject: mimetype, chain links, junk") {
    import graft.ops.Archives
    val epub = Archives.writeEpub(Seq(("T", "b")))
    assert(Archives.epubChapters(epub).isDefined)
    // a plain zip (wrong/missing mimetype) is not an EPUB
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.putNextEntry(new java.util.zip.ZipEntry("a.txt"))
    zos.write("x".getBytes); zos.closeEntry(); zos.close()
    assert(Archives.epubChapters(bos.toByteArray).isEmpty)
    val rnd = new scala.util.Random(5)
    for (_ <- 1 to 100)
      Archives.epubChapters(
        Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte))
    for (cut <- Seq(1, 30, epub.length / 2))
      Archives.epubChapters(epub.take(cut))
    assert(Archives.resolveHref("OEBPS/content.opf", "../top.xhtml") ==
      "top.xhtml")
    assert(Archives.resolveHref("a/b/c.opf", "./d/../e.xhtml") == "a/b/e.xhtml")
  }

  // ------------------------------------------------ WebP ANIM census

  test("animated WebP census + first-frame decode round-trip") {
    import graft.functions.{Vp8lCodec, WebpCodec}
    val img = Vp8lCodec.writeWebpPixels(9, 5, (x, y) => (x << 16) | y).drop(12)
    val anim = WebpCodec.writeAnimated(9, 5, 3,
      Seq((9, 5, 120, img), (9, 5, 80, img)))
    val m = WebpCodec.animMeta(anim).get
    assert(m.nFrames == 2 && m.totalDurationMs == 200 && m.loopCount == 3)
    assert(m.canvasW == 9 && m.canvasH == 5 && m.firstW == 9 && m.firstH == 5)
    // census arm still reads it as 'extended'
    assert(WebpCodec.meta(anim).get.variant == "extended")
    val frame = WebpCodec.firstFrameWebp(anim).get
    val px = Vp8lCodec.decodePixels(frame).get
    assert(px.width == 9 && px.height == 5)
    assert((px.rgb(3 * (2 * 9 + 4)) & 0xff) == 4) // (x=4,y=2): r = x
  }

  test("WebP ANIM chunk discipline and hostile containers reject") {
    import graft.functions.{Vp8lCodec, WebpCodec}
    val img = Vp8lCodec.writeWebpPixels(4, 4, (_, _) => 0x102030).drop(12)
    val good = WebpCodec.writeAnimated(4, 4, 0, Seq((4, 4, 50, img)))
    assert(WebpCodec.animMeta(good).isDefined)
    // a still extended container is not an animation
    assert(WebpCodec.animMeta(WebpCodec.writeExtendedHeader(4, 4)).isEmpty)
    // a plain lossless container is not an animation
    assert(WebpCodec.animMeta(Vp8lCodec.writeWebpPixels(4, 4,
      (_, _) => 0)).isEmpty)
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 200)
      WebpCodec.animMeta(Array.fill(rnd.nextInt(80))(rnd.nextInt(256).toByte))
    for (i <- 0 until good.length by 3) {
      val c = good.clone(); c(i) = (c(i) ^ 0x20).toByte
      WebpCodec.animMeta(c); WebpCodec.firstFrameWebp(c) // never throw
    }
    for (cut <- Seq(1, 12, 25, good.length / 2))
      WebpCodec.animMeta(good.take(cut))
  }

  // -------------------------------- PDF object streams + xref streams

  test("ObjStm-packed fonts and page dicts resolve; text round-trips") {
    import graft.functions.PdfCodec
    val texts = Seq("fi first page λ", "second fi page", "third official")
    val pdf = PdfCodec.writePdfObjStm("1.6", texts)
    // no classic trailer/xref anywhere — the 1.5+ layout is real
    val s = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(!s.contains("trailer") && !s.contains("xref\n0 "))
    val m = PdfCodec.meta(pdf).get
    assert(m.version == "1.6" && m.nPages == 3 && !m.encrypted)
    assert(PdfCodec.extractText(pdf).get == texts)
  }

  test("xref stream parses: W widths, type-1/2 rows, classic rejects") {
    import graft.functions.PdfCodec
    val pdf = PdfCodec.writePdfObjStm("1.5", Seq("a", "b"))
    val entries = PdfCodec.xrefStreamEntries(pdf).get
    assert(entries.size == 11) // 2*2+7
    assert(entries(0L).entryType == 0)
    assert(entries.values.count(_.entryType == 1) == 5) // 2 content+cmap+objstm+xref
    val t2 = entries.filter(_._2.entryType == 2)
    assert(t2.size == 5) // catalog+pages+2 page dicts+font
    assert(t2.values.forall(_.fieldB == 4L)) // all point at the ObjStm (obj 4)
    assert(t2.values.map(_.fieldC).toSeq.sorted == Seq(0L, 1L, 2L, 3L, 4L))
    // a classic-xref PDF has no xref stream
    assert(PdfCodec.xrefStreamEntries(
      PdfCodec.writePdf("1.4", 2, encrypted = false)).isEmpty)
  }

  test("incremental update: xref /Prev chain reads the EDITED document") {
    import graft.functions.PdfCodec
    val base = PdfCodec.writePdfObjStm("1.6", Seq("fi page zero", "page one"))
    val pdf = PdfCodec.writePdfIncrementalUpdate(base, 2,
      "revision two", "brand new page")
    // revision-aware walk: replaced page once, appended page present
    assert(PdfCodec.extractTextIncremental(pdf).get ==
      Seq("revision two", "page one", "brand new page"))
    // the linear stream walk shows WHY the chain matters: it still sees
    // the stale revision of page 0 (both revisions' streams exist)
    val linear = PdfCodec.extractText(pdf).get
    assert(linear.contains("fi page zero") && linear.contains("revision two"))
    // the un-edited base resolves identically through both paths
    assert(PdfCodec.extractTextIncremental(base).get ==
      PdfCodec.extractText(base).get)
    // newest xref /Size reflects the two appended objects
    val entries = PdfCodec.xrefStreamEntries(pdf).get
    assert(entries.size == 13) // base 11 + content + page dict
    // classic documents have no chain: falls back to None
    assert(PdfCodec.extractTextIncremental(
      PdfCodec.writePdfWithText("1.4", Seq("x"))).isEmpty)
  }

  test("incremental update fuzz: flips and truncations never throw") {
    import graft.functions.PdfCodec
    val pdf = PdfCodec.writePdfIncrementalUpdate(
      PdfCodec.writePdfObjStm("1.6", Seq("fi a")), 1, "r", "n")
    for (i <- 0 until pdf.length by 13) {
      val c = pdf.clone(); c(i) = (c(i) ^ (1 << (i % 8))).toByte
      PdfCodec.extractTextIncremental(c)
    }
    for (cut <- Seq(1, 60, pdf.length / 2, pdf.length - 2))
      PdfCodec.extractTextIncremental(pdf.take(cut))
  }

  test("ObjStm fuzz: flips and truncations never throw") {
    import graft.functions.PdfCodec
    val pdf = PdfCodec.writePdfObjStm("1.6", Seq("fi page"))
    for (i <- 0 until pdf.length by 11) {
      val c = pdf.clone(); c(i) = (c(i) ^ (1 << (i % 8))).toByte
      PdfCodec.extractText(c)
      PdfCodec.xrefStreamEntries(c)
      PdfCodec.meta(c)
    }
    for (cut <- Seq(1, 40, pdf.length / 2, pdf.length - 3)) {
      PdfCodec.extractText(pdf.take(cut))
      PdfCodec.xrefStreamEntries(pdf.take(cut))
    }
  }

  test("EPUB metadata census: Dublin Core fields round-trip, XML escapes") {
    import graft.ops.Archives
    val epub = Archives.writeEpubWithMeta(
      Seq(("T<itle&", "b"), ("Two", "b2")),
      creator = "A. <Author> & Co", language = "de",
      identifier = "urn:x:1")
    val (t, c, l, i, spine) = Archives.epubMeta(epub).get
    assert(t == "T<itle&" && c == "A. <Author> & Co")
    assert(l == "de" && i == "urn:x:1" && spine == 2)
    // chapters still extract from the enriched container
    assert(Archives.epubChapters(epub).get.length == 2)
    // plain epub: creator/language empty, identifier = the fixture id
    val (t2, c2, l2, i2, s2) = Archives.epubMeta(
      Archives.writeEpub(Seq(("X", "y")))).get
    assert(t2 == "X" && c2 == "" && l2 == "" &&
      i2 == "graft-fixture" && s2 == 1)
    // non-epub zips reject
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.putNextEntry(new java.util.zip.ZipEntry("a")); zos.write(1)
    zos.closeEntry(); zos.close()
    assert(Archives.epubMeta(bos.toByteArray).isEmpty)
  }

  // ------------------------------------- zip central directory + zip64

  private def le(out: java.io.ByteArrayOutputStream, v: Long, n: Int): Unit =
    for (i <- 0 until n) out.write(((v >> (8 * i)) & 0xff).toInt)

  /** Forced-zip64 single-member archive: masked 32-bit fields with the
    * real values in the 0x0001 extra, zip64 EOCD + locator, masked EOCD. */
  private def writeZip64Fixture(content: Array[Byte],
                                breakIt: String = ""): Array[Byte] = {
    val name = "big.txt".getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32(); crc.update(content)
    val out = new java.io.ByteArrayOutputStream()
    // local header @0
    out.write(Array[Byte]('P', 'K', 3, 4)); le(out, 45, 2); le(out, 0, 2)
    le(out, 0, 2); le(out, 0, 4); le(out, crc.getValue, 4)
    le(out, 0xffffffffL, 4); le(out, 0xffffffffL, 4)
    le(out, name.length, 2); le(out, 20, 2)
    out.write(name)
    le(out, 1, 2); le(out, 16, 2)
    le(out, content.length, 8); le(out, content.length, 8)
    out.write(content)
    val cdOff = out.size()
    // central entry
    out.write(Array[Byte]('P', 'K', 1, 2)); le(out, 45, 2); le(out, 45, 2)
    le(out, 0, 2); le(out, 0, 2); le(out, 0, 4); le(out, crc.getValue, 4)
    le(out, 0xffffffffL, 4); le(out, 0xffffffffL, 4)
    le(out, name.length, 2); le(out, 28, 2); le(out, 0, 2)
    le(out, 0, 2); le(out, 0, 2); le(out, 0, 4); le(out, 0xffffffffL, 4)
    out.write(name)
    le(out, 1, 2); le(out, 24, 2)
    le(out, content.length, 8); le(out, content.length, 8); le(out, 0, 8)
    val cdSize = out.size() - cdOff
    val e64Off = out.size()
    // zip64 EOCD record
    out.write(Array[Byte]('P', 'K', 6, 6)); le(out, 44, 8)
    le(out, 45, 2); le(out, 45, 2); le(out, 0, 4); le(out, 0, 4)
    le(out, if (breakIt == "count") 2 else 1, 8); le(out, 1, 8)
    le(out, cdSize, 8); le(out, cdOff, 8)
    // locator
    out.write(Array[Byte]('P', 'K', 6, 7)); le(out, 0, 4)
    le(out, if (breakIt == "locator") e64Off + 9999 else e64Off, 8)
    le(out, if (breakIt == "disks") 2 else 1, 4)
    // masked EOCD
    out.write(Array[Byte]('P', 'K', 5, 6)); le(out, 0, 2); le(out, 0, 2)
    le(out, 0xffff, 2); le(out, 0xffff, 2)
    le(out, 0xffffffffL, 4); le(out, 0xffffffffL, 4); le(out, 0, 2)
    out.toByteArray
  }

  test("zip64 EOCD locator + record + per-entry extras parse") {
    import graft.ops.Archives
    val content = "hello zip64 content".getBytes("UTF-8")
    val (entries, z64) =
      Archives.zipCentralMembers(writeZip64Fixture(content)).get
    assert(z64)
    assert(entries.length == 1)
    assert(entries.head.name == "big.txt")
    assert(entries.head.uncompSize == content.length)
    assert(entries.head.compSize == content.length)
    assert(entries.head.localOffset == 0)
  }

  test("zip central walk agrees with streaming on ordinary archives") {
    import graft.ops.Archives
    val epub = Archives.writeEpub(Seq(("A", "a"), ("B", "b")))
    val (entries, z64) = Archives.zipCentralMembers(epub).get
    assert(!z64)
    val zis = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(epub))
    val streamed = Iterator.continually(zis.getNextEntry)
      .takeWhile(_ != null).map(_.getName).toSeq
    assert(entries.map(_.name) == streamed)
    assert(entries.head.name == "mimetype" &&
      entries.head.uncompSize == 20)
  }

  test("zip64 inconsistencies and junk reject, never throw") {
    import graft.ops.Archives
    val c = "x".getBytes
    assert(Archives.zipCentralMembers(writeZip64Fixture(c, "count")).isEmpty)
    assert(Archives.zipCentralMembers(writeZip64Fixture(c, "locator")).isEmpty)
    assert(Archives.zipCentralMembers(writeZip64Fixture(c, "disks")).isEmpty)
    val good = writeZip64Fixture(c)
    for (cut <- Seq(1, 20, good.length / 2, good.length - 1))
      Archives.zipCentralMembers(good.take(cut))
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200)
      Archives.zipCentralMembers(
        Array.fill(rnd.nextInt(120))(rnd.nextInt(256).toByte))
  }

  test("non-V1L3 and hostile inputs keep -1 sentinels, never throw") {
    // stub header fixture (96-byte body): tiny span, frames is a small
    // non-negative estimate, channels parse
    val stub = Mp3Codec.writeMp3Header(9, 0, 0)
    val m = Mp3Codec.meta(stub).get
    assert(m.channels == 2 && m.frames >= 0)
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 300) {
      val junk = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      Mp3Codec.meta(junk) // must not throw
    }
    val x = Mp3Codec.writeMp3Xing(2, mono = false, frames = 10)
    for (i <- x.indices) {
      val c = x.clone(); c(i) = (c(i) ^ 0x40).toByte
      Mp3Codec.meta(c) // must not throw
    }
  }
}
