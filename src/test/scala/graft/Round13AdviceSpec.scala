package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 regression pins for the round-12 advice items:
  *  - the WARC Content-Encoding deflate path must REFUSE (not spin on)
  *    a zlib stream whose FDICT bit demands a preset dictionary;
  *  - brotli window-bits second-group decode per RFC 7932 §9.1
  *    (value 1 reserved; 2..7 → WBITS 10..15 — previously WBITS=11
  *    streams were rejected and reserved value 1 accepted);
  *  - a complex prefix code defining exactly ONE symbol is a valid
  *    zero-bit code (§3.5), not a kraft-deficit error;
  *  - PDF decryptPdf must NOT decrypt /Type /XRef streams
  *    (ISO 32000-1 §7.5.8.2 excludes cross-reference streams);
  *  - the /Encrypt object lookup must not match inside an unrelated
  *    object header sharing a digit suffix (12 vs 112). */
class Round13AdviceSpec extends AnyFunSuite {

  // ------------------------------------------- deflate FDICT refusal

  test("Content-Encoding deflate: zlib FDICT stream refuses, no hang") {
    val dict = "the preset dictionary".getBytes("UTF-8")
    val d = new java.util.zip.Deflater()
    d.setDictionary(dict)
    d.setInput("hello hello hello the preset dictionary".getBytes("UTF-8"))
    d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end()
    val body = out.toByteArray
    // zlib header FLG bit 5 (FDICT) is set on dictionary streams
    assert((body(1) & 0x20) != 0, "fixture did not set FDICT")
    // must return None promptly — the old loop spun forever here
    assert(graft.ops.Archives.decodeContentEncoding("deflate", body).isEmpty)
    // and a plain (no-dictionary) stream still round-trips
    val plain = {
      val d2 = new java.util.zip.Deflater()
      d2.setInput("plain zlib".getBytes("UTF-8")); d2.finish()
      val o2 = new java.io.ByteArrayOutputStream()
      while (!d2.finished()) o2.write(tmp, 0, d2.deflate(tmp))
      d2.end(); o2.toByteArray
    }
    assert(graft.ops.Archives.decodeContentEncoding("deflate", plain)
      .map(new String(_, "UTF-8")).contains("plain zlib"))
  }

  // --------------------------------------------- brotli window bits

  test("brotli WBITS=11 (second-group value 3) is a VALID empty stream") {
    // bits: 1 | n=000 | m=011(LSB) | ISLAST=1 | ISLASTEMPTY=1
    val s = Array(0xB1.toByte, 0x01.toByte)
    assert(BrotliCodec.decode(s).exists(_.isEmpty),
      s"WBITS=11 rejected: ${BrotliCodec.lastBail}")
  }

  test("brotli second-group value 1 is RESERVED and refuses") {
    // bits: 1 | n=000 | m=001(LSB) | ISLAST=1 | ISLASTEMPTY=1
    val s = Array(0x91.toByte, 0x01.toByte)
    assert(BrotliCodec.decode(s).isEmpty)
  }

  test("all valid second-group window-bit patterns decode (10..15, 17)") {
    // m=0 → 17; m=2..7 → 10..15; every one must accept an empty stream
    for (m <- Seq(0, 2, 3, 4, 5, 6, 7)) {
      val bits = Seq(1, 0, 0, 0, m & 1, (m >> 1) & 1, (m >> 2) & 1, 1, 1)
      var b0 = 0; var b1 = 0
      bits.zipWithIndex.foreach { case (v, i) =>
        if (i < 8) b0 |= v << i else b1 |= v << (i - 8)
      }
      assert(BrotliCodec.decode(Array(b0.toByte, b1.toByte))
        .exists(_.isEmpty), s"m=$m refused: ${BrotliCodec.lastBail}")
    }
  }

  // --------------------------- brotli single-symbol complex prefix code

  /** LSB-first bit accumulator matching [[BrotliCodec.BitReader]]. */
  private final class BitSink {
    private val bytes = scala.collection.mutable.ArrayBuffer[Byte]()
    private var bitPos = 0
    def put(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        if (bitPos % 8 == 0) bytes += 0
        val bit = (v >> i) & 1
        bytes(bitPos / 8) = (bytes(bitPos / 8) | (bit << (bitPos % 8))).toByte
        bitPos += 1
        i += 1
      }
    }
    /** Emit one code-length symbol via the fixed 4-bit-peek table. */
    def putCl(sym: Int): Unit = {
      val p = BrotliCodec.ClPeekVal.indexOf(sym)
      require(p >= 0, s"cl symbol $sym not in peek table")
      put(p, BrotliCodec.ClPeekLen(p))
    }
    def toBytes: Array[Byte] = bytes.toArray
  }

  /** Emit a canonical prefix-code word MSB-first (the order
    * [[BrotliCodec.Prefix.decode]] consumes bits in). */
  private def putCode(w: BitSink, code: Int, len: Int): Unit = {
    var i = len - 1
    while (i >= 0) { w.put((code >> i) & 1, 1); i -= 1 }
  }

  test("complex prefix code with exactly ONE symbol REFUSES (under-full; " +
    "reference decoder: ERROR_FORMAT_HUFFMAN_SPACE)") {
    // CL tree {sym0→len1, sym1→len2, sym17→len2}: space 16+8+8 = 32
    // (complete); canonical: 0→"0", 1→"10", 17→"11". The SYMBOL code
    // then carries one symbol at length 1 — 16384 of 32768, under-full.
    // RFC 7932 §3.5's single-code exception is only for the
    // code-length code; brotlicffi rejects this stream (round-13
    // advice, verified empirically), so we must too: a single-symbol
    // code is expressible only via the simple form.
    val w = new BitSink
    w.put(0, 2) // hskip = 0 → complex form
    // ClOrder walk: sym1=2, sym2..4=0, sym0=1, sym5=0, sym17=2
    w.putCl(2); w.putCl(0); w.putCl(0); w.putCl(0)
    w.putCl(1); w.putCl(0); w.putCl(2) // space hits 0 → header done
    putCode(w, 0x2, 2) // CL sym1 "10": symbol 0 gets length 1
    var i = 0
    while (i < 255) { putCode(w, 0x0, 1); i += 1 } // 255 explicit zeros
    w.put(0, 8) // slack so decode never hits end-of-input
    val br = new BrotliCodec.BitReader(w.toBytes)
    intercept[RuntimeException] {
      BrotliCodec.readPrefixCode(br, 256)
    }
    assert(BrotliCodec.lastBail == "L257")
  }

  test("complex prefix code under-full with TWO symbols still bails") {
    // symbols 0 and 1 at length 2 each: 8192+8192 of 32768 — a deficit
    // with two live symbols is NOT the single-symbol case.
    // CL tree {sym2→len1, sym0→len2, sym17→len2}: canonical
    // 2→"0", 0→"10", 17→"11"
    val w = new BitSink
    w.put(0, 2)
    // ClOrder walk: sym1=0, sym2=1, sym3=0, sym4=0, sym0=2, sym5=0,
    // sym17=2 → space 16+8+8 = 32
    w.putCl(0); w.putCl(1); w.putCl(0); w.putCl(0)
    w.putCl(2); w.putCl(0); w.putCl(2)
    putCode(w, 0x0, 1) // CL sym2: symbol 0 ← length 2
    putCode(w, 0x0, 1) // CL sym2: symbol 1 ← length 2
    var i = 0
    while (i < 254) { putCode(w, 0x2, 2); i += 1 } // CL sym0 zeros
    w.put(0, 8)
    val br = new BrotliCodec.BitReader(w.toBytes)
    intercept[RuntimeException] {
      BrotliCodec.readPrefixCode(br, 256)
    }
    assert(BrotliCodec.lastBail == "L257")
  }

  // --------------------------------------------- PDF advice items

  test("decryptPdf leaves /Type /XRef stream bytes untouched") {
    val pdf = PdfCodec.writePdfEncryptedText("1.4",
      Seq("xref stream exclusion law"), "owner", r = 3)
    // splice an (unreferenced) xref-stream-shaped object after %%EOF:
    // its bytes must survive decryptPdf verbatim
    val xrefBody = "XREFPAYLOAD-0123456789".getBytes("ISO-8859-1")
    val extra = (s"\n900 0 obj\n<< /Type /XRef /Length ${xrefBody.length}" +
      " >>\nstream\n").getBytes("ISO-8859-1") ++ xrefBody ++
      "\nendstream\nendobj\n".getBytes("ISO-8859-1")
    val spliced = pdf ++ extra
    val out = PdfCodec.decryptPdf(spliced)
      .getOrElse(fail("decrypt refused the spliced document"))
    val outS = new String(out, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(outS.contains("XREFPAYLOAD-0123456789"),
      "xref stream body was corrupted by decryption")
    // sanity: real content still extracts through decryption
    assert(PdfCodec.extractTextEncrypted(spliced)
      .exists(_.exists(_.contains("xref stream exclusion law"))))
  }

  test("/Encrypt lookup is not fooled by a longer object number prefix") {
    // "112 0 obj" appears first; /Encrypt references object 12 — the
    // unanchored regex used to parse 112's dictionary and fail
    val o = "0" * 64
    val u = "1" * 64
    val doc = ("%PDF-1.4\n" +
      "112 0 obj\n<< /Foo (bar) >>\nendobj\n" +
      "12 0 obj\n<< /Filter /Standard /V 1 /R 2 /Length 40 /P -44" +
      s" /O <$o> /U <$u> >>\nendobj\n" +
      "trailer\n<< /Encrypt 12 0 R /ID [<00112233445566778899aabbccddeeff>" +
      " <00112233445566778899aabbccddeeff>] >>\n%%EOF")
      .getBytes("ISO-8859-1")
    val m = PdfCodec.encryptMeta(doc)
      .getOrElse(fail("encryptMeta missed the /Encrypt dict"))
    assert(m.v == 1 && m.r == 2 && m.lengthBits == 40 && m.standard)
  }
}
