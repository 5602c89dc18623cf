package graft

import graft.functions.PdfCodec
import org.scalatest.funsuite.AnyFunSuite

/** RC4 standard-security-handler laws: RC4 self-inverse, O/U entry
  * derivation, empty-password authentication, decrypt-then-extract
  * across R2/R3 × plain/flate, wrong-owner-password immunity (owner
  * password does not gate the user-password path), and the
  * hostile/None scope edges (AES V4, non-empty user password). */
class Round12PdfEncSpec extends AnyFunSuite {

  test("RC4 is its own inverse and matches a known public vector") {
    val key = "Key".getBytes("US-ASCII")
    val pt = "Plaintext".getBytes("US-ASCII")
    val ct = PdfCodec.rc4(key, pt)
    // RFC 6229-era folk vector: RC4("Key", "Plaintext") =
    // BBF316E8D940AF0AD3
    assert(ct.map("%02X".format(_)).mkString == "BBF316E8D940AF0AD3")
    assert(PdfCodec.rc4(key, ct).toSeq == pt.toSeq)
  }

  test("encrypted fixtures census as standard-handler, open, right V/R") {
    for ((r, len) <- Seq((2, 40), (3, 128), (3, 40))) {
      val pdf = PdfCodec.writePdfEncryptedText("1.4",
        Seq("secret page one", "and two"), "owner-pwd", r, len)
      val m = PdfCodec.encryptMeta(pdf).getOrElse(fail(s"no meta r=$r"))
      assert(m.standard && m.r == r && m.lengthBits == len)
      assert(m.v == (if (r == 2) 1 else 2))
      assert(m.emptyUserPwd, s"empty pwd must authenticate (r=$r)")
      // the plain census flags it encrypted
      assert(PdfCodec.meta(pdf).exists(_.encrypted))
      // unencrypted docs have no encrypt meta
      assert(PdfCodec.encryptMeta(
        PdfCodec.writePdfWithText("1.4", Seq("open"))).isEmpty)
    }
  }

  test("decrypt + extract recovers the text, R2/R3 × plain/flate") {
    for {
      r <- Seq(2, 3)
      flate <- Seq(false, true)
    } {
      val texts = Seq("alpha beta gamma", "delta", "epsilon zeta")
      val len = if (r == 2) 40 else 128
      val pdf = PdfCodec.writePdfEncryptedText("1.5", texts,
        s"owner$r", r, len, flate)
      // without decryption the text must NOT be readable
      val raw = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
      assert(!raw.contains("alpha beta gamma"), "stream left in the clear")
      val got = PdfCodec.extractTextEncrypted(pdf).getOrElse(
        fail(s"extract failed r=$r flate=$flate"))
      assert(got == texts, s"r=$r flate=$flate")
      // and the generic extractText on the raw bytes does not see it
      val blind = PdfCodec.extractText(pdf)
      assert(!blind.exists(_ == texts), "undec extraction matched?!")
    }
  }

  test("owner password strength does not affect empty-user-pwd opening") {
    val a = PdfCodec.writePdfEncryptedText("1.4", Seq("x"), "short", 3, 128)
    val b = PdfCodec.writePdfEncryptedText("1.4", Seq("x"),
      "a-much-longer-and-stronger-owner-password!", 3, 128)
    assert(PdfCodec.extractTextEncrypted(a).contains(Seq("x")))
    assert(PdfCodec.extractTextEncrypted(b).contains(Seq("x")))
    // different owner passwords → different O entries → different keys
    assert(!java.util.Arrays.equals(a, b))
  }

  test("out-of-scope and hostile inputs return None, never throw") {
    val pdf = PdfCodec.writePdfEncryptedText("1.4", Seq("s"), "o", 3, 128)
    // forge V4 (AES) → census still reads it, decrypt refuses
    val s = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
    val v4 = s.replace("/V 2 /R 3", "/V 4 /R 4")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PdfCodec.decryptPdf(v4).isEmpty)
    assert(PdfCodec.encryptMeta(v4).exists(m => !m.emptyUserPwd))
    // corrupt the U entry → authentication fails → None (the
    // non-empty-user-password shape)
    val um = java.util.regex.Pattern.compile("/U <([0-9A-F]+)>").matcher(s)
    assert(um.find())
    val flipped = (s.substring(0, um.start(1)) +
      (if (s.charAt(um.start(1)) == '0') "1" else "0") +
      s.substring(um.start(1) + 1))
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PdfCodec.decryptPdf(flipped).isEmpty)
    assert(PdfCodec.encryptMeta(flipped).exists(m => !m.emptyUserPwd))
    // fuzz: flips and truncations never throw
    val rnd = new scala.util.Random(9)
    for (cut <- 0 to pdf.length by 41) {
      PdfCodec.decryptPdf(pdf.take(cut))
      PdfCodec.encryptMeta(pdf.take(cut))
    }
    for (_ <- 0 until 300) {
      val c = pdf.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      PdfCodec.decryptPdf(c)
      PdfCodec.encryptMeta(c)
      PdfCodec.extractTextEncrypted(c)
    }
  }
}
